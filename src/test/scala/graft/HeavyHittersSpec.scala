package graft

import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters

/** Misra-Gries distributed frequent items: exactness when m covers the
  * domain, and the mergeable-summaries sandwich bound + guaranteed recall
  * of sufficiently heavy items when it doesn't.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("m >= distinct keys: summary is exact with zero error bound") {
    val data = (0 until 1000).map(i => s"k${i % 37}").toDF("k").repartition(8)
    val s = HeavyHitters.summarize(data, "k", m = 64).collect()
    assert(s.length == 37)
    assert(s.forall(_.getAs[Long]("err_bound") == 0L))
    val got = s.map(r => r.getAs[String]("k") -> r.getAs[Long]("est_count")).toMap
    val want = (0 until 37).map(i => s"k$i" ->
      (1000 / 37 + (if (i < 1000 % 37) 1 else 0)).toLong).toMap
    assert(got == want)
  }

  test("small m: sandwich bound holds for every reported item") {
    val rnd = new scala.util.Random(42)
    val heavy = (0 until 3).flatMap(i => Seq.fill(500)(s"h$i"))
    val tail = (0 until 2000).map(i => s"t$i")
    val data = rnd.shuffle(heavy ++ tail).toDF("k").repartition(8)
    val exact = data.groupBy($"k").count().collect()
      .map(r => r.getAs[String]("k") -> r.getAs[Long]("count")).toMap
    val s = HeavyHitters.summarize(data, "k", m = 16).collect()
    s.foreach { r =>
      val k = r.getAs[String]("k")
      val lower = r.getAs[Long]("est_count")
      val err = r.getAs[Long]("err_bound")
      assert(lower <= exact(k), s"$k lower $lower > exact ${exact(k)}")
      assert(exact(k) <= lower + err, s"$k exact ${exact(k)} > $lower + $err")
    }
  }

  test("a partition whose final sweep empties its summary still feeds the error bound") {
    // m=2, partition 0 stream [a, b, c]: c triggers the sweep, a and b
    // hit zero and evict, c is never stored — the summary ends EMPTY
    // with one decrement. d_p rode only on emitted rows, so this
    // partition's decrement silently vanished from Σ d_p and a's
    // sandwich bound was violated: true count 6 > est 5 + err 0.
    val p0 = Seq("a", "b", "c").toDF("k").coalesce(1)
    val p1 = Seq.fill(5)("a").toDF("k").coalesce(1)
    val s = HeavyHitters.summarize(p0.union(p1), "k", m = 2).collect()
    val a = s.find(_.getAs[String]("k") == "a").get
    val est = a.getAs[Long]("est_count")
    val err = a.getAs[Long]("err_bound")
    assert(est == 5L)
    assert(6L <= est + err, s"true 6 > est $est + err $err")
    // the carrier row never surfaces as an item
    assert(s.forall(_.getAs[String]("k") != null))
  }

  test("small m: planted heavies always surface in the top-k") {
    val rnd = new scala.util.Random(7)
    // n = 3*500 + 2000 = 3500 over 8 partitions, m=32:
    // eviction budget Σ n_p/m ≈ 110 per partition-sweep total; 500 ≫ that
    val heavy = (0 until 3).flatMap(i => Seq.fill(500)(s"h$i"))
    val tail = (0 until 2000).map(i => s"t$i")
    val data = rnd.shuffle(heavy ++ tail).toDF("k").repartition(8)
    val top = HeavyHitters.topK(data, "k", k = 3, m = 32).collect()
      .map(_.getAs[String]("k")).toSet
    assert(top == Set("h0", "h1", "h2"), top)
  }
}
