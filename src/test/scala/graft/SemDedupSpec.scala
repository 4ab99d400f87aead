package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilaritySearch

/** SemDeDup (SimilaritySearch.semDedup) — the machine checks behind the
  * rows-only q99 catalog row:
  *
  *  1. planted exact clones collapse to one survivor per group, and
  *     distinct singletons all survive;
  *  2. the keeper rule holds group-wise on the real gate corpus: the
  *     kept member is the group's (centroid_sim, id)-minimum — the
  *     paper's farthest-from-centroid rule with deterministic ties;
  *  3. group assignment is complete on the gate corpus: any two
  *     same-cell vectors with cosine >= threshold share a dup_group
  *     (verified against an independent driver-side cosine rebuild);
  *  4. two runs produce value-identical output (the q58 determinism
  *     contract extended to the k-means path).
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  test("a non-integral id column fails loudly instead of silently keeping one row") {
    // the internal cast to long would null every string id: empty pair
    // set, one null dup_group, a single survivor for the whole corpus
    val df = Seq(("u1", Seq(1.0, 0.0)), ("u2", Seq(0.0, 1.0)))
      .toDF("id", "embedding")
    val e = intercept[IllegalArgumentException] {
      SimilaritySearch.semDedup(df, "id", "embedding", 0.9)
    }
    assert(e.getMessage.contains("integral id"), e.getMessage)
  }

  test("planted clones: one survivor per clone group, singletons untouched") {
    // three well-separated orthogonal-ish bases, each with 3 exact
    // clones; plus 4 far-apart singletons
    val dim = 8
    def base(i: Int): Array[Float] = {
      val v = Array.fill(dim)(0.01f); v(i) = 1.0f; v
    }
    val rows =
      (0 until 3).flatMap(g => (0 until 3).map(c =>
        ((g * 10 + c).toLong, base(g).toSeq))) ++
      (0 until 4).map(i => ((100 + i).toLong, base(4 + i % 4).toSeq))
    val df = rows.toDF("vec_id", "embedding")
    val out = SimilaritySearch.semDedup(df, "vec_id", "embedding",
      threshold = 0.999, numCells = 4).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(4)))
    assert(out.length == rows.length) // one row per vector, nothing lost
    val byGroup = out.groupBy(_._2)
    // each planted clone triple is one group with exactly one keeper
    for (g <- 0 until 3) {
      val members = byGroup.values.find(_.exists(_._1 == g * 10)).get
      assert(members.map(_._1).toSet == Set(g * 10L, g * 10 + 1L, g * 10 + 2L))
      assert(members.count(_._3) == 1)
      // exact clones have identical centroid_sim -> min-id tie-break
      assert(members.find(_._3).get._1 == g * 10L)
    }
    // singletons: their own group, kept
    (100 until 104).foreach { id =>
      assert(out.find(_._1 == id).exists(r => r._2 == id && r._3))
    }
  }

  test("gate corpus: keeper rule and group completeness vs a driver-side rebuild") {
    val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val out = SimilaritySearch.semDedup(emb, "vec_id", "embedding",
      threshold = 0.35, numCells = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    val n = emb.count()
    assert(out.length == n && out.map(_._1).distinct.length == n)

    // keeper rule: within every group, kept == (centroid_sim, id)-min
    out.groupBy(_._3).values.foreach { members =>
      val expectKeep = members.minBy(m => (m._4, m._1))._1
      assert(members.filter(_._5).map(_._1).toSeq == Seq(expectKeep))
    }

    // completeness: recompute within-cell cosine pairs driver-side from
    // the raw vectors + the OUTPUT's cell assignment; every >=τ pair
    // must share a dup_group (CC may merge further via chains — that is
    // correct — but it may never split a direct pair)
    val vecs = emb.select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val group = out.map(r => r._1 -> r._3).toMap
    var pairsChecked = 0
    out.groupBy(_._2).values.foreach { cellMembers =>
      val ids = cellMembers.map(_._1).sorted
      for (i <- ids.indices; j <- i + 1 until ids.length) {
        if (cos(vecs(ids(i)), vecs(ids(j))) >= 0.35) {
          assert(group(ids(i)) == group(ids(j)),
            s"pair (${ids(i)}, ${ids(j)}) >= threshold but split across groups")
          pairsChecked += 1
        }
      }
    }
    assert(pairsChecked > 0) // the corpus really contains near-dups
  }

  test("semDedup output is deterministic across runs") {
    val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    def run() = SimilaritySearch.semDedup(emb, "vec_id", "embedding",
      threshold = 0.35, numCells = 8).orderBy($"id").collect().toSeq
    assert(run() == run())
  }
}
