package graft

import graft.functions.Bpe

/** Contracts for the BPE tokenizer core and the q94 catalog query. No SQL
  * oracle exists for an iterative merge loop, so these ARE the machine
  * checks: lossless round-trip, merge monotonicity, planted collapse,
  * and cross-run determinism.
  */
class BpeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def corpusVocab: Seq[(String, Long)] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    Tables.load(spark, sfDir, "documents")
      .select(explode(expr("filter(split(text, '\\\\s+'), w -> w != '')")).as("word"))
      .groupBy($"word").agg(count(lit(1)).as("freq"))
      .orderBy($"freq".desc, $"word")
      .as[(String, Long)].collect().toSeq
  }

  test("encode round-trips losslessly for every corpus vocab word") {
    val vocab = corpusVocab
    val ranks = Bpe.learnMerges(vocab, 50).zipWithIndex.toMap
    vocab.foreach { case (w, _) =>
      val toks = Bpe.encode(w, ranks)
      assert(toks.mkString == w, s"round-trip broke: $w -> $toks")
      assert(toks.nonEmpty && toks.forall(_.nonEmpty))
    }
  }

  test("more merges never increase any word's token count; zero merges = chars") {
    val vocab = corpusVocab
    val r0 = Map.empty[Bpe.Pair, Int]
    val r10 = Bpe.learnMerges(vocab, 10).zipWithIndex.toMap
    val r50 = Bpe.learnMerges(vocab, 50).zipWithIndex.toMap
    // learnMerges(k) must be a prefix of learnMerges(k') for k < k' —
    // greedy selection depends only on earlier merges
    assert(r50.toSeq.sortBy(_._2).take(10).map(_._1) ==
      r10.toSeq.sortBy(_._2).map(_._1))
    vocab.foreach { case (w, _) =>
      val n0 = Bpe.encode(w, r0).length
      val n10 = Bpe.encode(w, r10).length
      val n50 = Bpe.encode(w, r50).length
      assert(n0 == w.length, s"zero merges must yield character tokens: $w")
      assert(n50 <= n10 && n10 <= n0, s"monotonicity broke for $w: $n0/$n10/$n50")
    }
  }

  test("planted repetition collapses to one token; ties break lexicographically") {
    // "aaaaaaaa" needs exactly 3 doubling merges: aa, aaaa, aaaaaaaa
    val merges = Bpe.learnMerges(Seq(("aaaaaaaa", 5L)), 10)
    assert(merges == Seq(("a", "a"), ("aa", "aa"), ("aaaa", "aaaa")), merges)
    assert(Bpe.encode("aaaaaaaa", merges.zipWithIndex.toMap) == Seq("aaaaaaaa"))
    // "abcd" ×1: pairs ab/bc/cd all count 1 — the lexicographically
    // smallest pair must win each round, deterministically
    val tie = Bpe.learnMerges(Seq(("abcd", 1L)), 1)
    assert(tie == Seq(("a", "b")), tie)
  }

  test("learned merge table is identical across repeated runs") {
    val vocab = corpusVocab
    assert(Bpe.learnMerges(vocab, 50) == Bpe.learnMerges(vocab, 50))
  }

  test("q94 per-doc counts are consistent: words <= tokens <= chars") {
    val rows = SparkEntry.queries("q94_bpe_tokenize")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nw = r.getAs[Long]("n_words")
      val nt = r.getAs[Long]("n_tokens")
      val cpt = r.getAs[Double]("chars_per_token")
      assert(nw <= nt, s"fewer tokens than words in ${r}")
      assert(cpt >= 1.0, s"tokens longer than their characters in ${r}")
    }
  }
}
