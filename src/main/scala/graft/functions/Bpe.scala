package graft.functions

import scala.collection.mutable

/** Byte-pair-encoding core (Sennrich et al. ACL'16, algorithm 1): the
  * tokenizer-TRAINING merge loop and the tokenizer-APPLY encode loop as
  * plain deterministic Scala over a (word, freq) vocabulary.
  *
  * Deliberately driver-side: BPE state is vocabulary-sized (Zipf-bounded
  * — q83's observation), so training runs over the collected vocab
  * exactly like the PQ codebook fit (one bounded job), and the learned
  * ranks broadcast to encode each DISTINCT word once. The corpus itself
  * never runs a merge loop — per-doc token counts come from a broadcast
  * join of words to their precomputed encodings (see q94).
  *
  * Determinism contract: merge selection ties break lexicographically on
  * the pair, so the same vocab always yields the same merge table across
  * runs, partitionings, and JVMs (no hash-order dependence).
  */
object Bpe {

  type Pair = (String, String)

  /** Train: repeatedly merge the most frequent adjacent symbol pair.
    * O(numMerges · Σ word_len) over the vocabulary, not the corpus.
    */
  def learnMerges(vocab: Seq[(String, Long)], numMerges: Int): Seq[Pair] = {
    var words: Seq[(Array[String], Long)] =
      vocab.map { case (w, f) => (w.map(_.toString).toArray, f) }
    val merges = mutable.ArrayBuffer.empty[Pair]
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      val counts = mutable.Map.empty[Pair, Long]
      for ((syms, f) <- words; i <- 0 until syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        counts(p) = counts.getOrElse(p, 0L) + f
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, f) => (mergeAll(syms, best), f) }
      }
    }
    merges.toSeq
  }

  /** Apply: encode one word under a ranked merge table — repeatedly merge
    * the lowest-ranked pair present (the standard tokenizer apply loop).
    * Concatenating the result always reproduces the word exactly (merges
    * only ever join adjacent symbols — the round-trip spec pins this).
    */
  def encode(word: String, ranks: Map[Pair, Int]): Seq[String] = {
    var syms: Array[String] = word.map(_.toString).toArray
    var more = syms.length > 1
    while (more) {
      var bestRank = Int.MaxValue
      var best: Pair = null
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        val r = ranks.getOrElse(p, Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = p }
        i += 1
      }
      if (best == null) more = false
      else {
        syms = mergeAll(syms, best)
        more = syms.length > 1
      }
    }
    syms.toSeq
  }

  private def mergeAll(syms: Array[String], m: Pair): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == m._1 && syms(i + 1) == m._2) {
        out += m._1 + m._2
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }
}
