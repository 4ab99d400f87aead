package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** QUERY-DIRECTED MULTI-PROBE bucket set from a hyperplane dots array
  * (Lv et al., "Multi-probe LSH: efficient indexing for high-dimensional
  * similarity search", VLDB 2007, adapted to sign-pattern buckets):
  * `array<long>` of the canonical sign-pattern bucket followed by the
  * HAMMING BALL of radius `radius` over the `flips` planes the vector is
  * CLOSEST to (smallest |dot|, ties by plane index) — exactly the planes
  * a true neighbor most plausibly sits across. Output order: canonical
  * bucket, then every non-empty subset of the closest planes by subset
  * size then closeness rank, so `radius = 1` is bit-for-bit the probe
  * list earlier single-flip indexes were built and pinned against.
  * Probe count is 1 + Σ_{s=1..radius} C(flips, s). The canonical
  * bucketing rule (`ds[i] >= 0 → bit i`) is unchanged, so probe rows
  * join durable indexes built by any earlier run.
  *
  * The radius exists because single-bit probing caps per-table recall
  * at P[buckets differ in ≤ 1 plane] — at 8+ planes an at-threshold
  * pair usually differs in ≥ 2, and NO amount of single-flip probing
  * can reach it ([[graft.operators.SimilaritySearch.resolveRadius]]
  * derives the radius from the geometry and threshold).
  *
  * Native expression rather than composed `when` columns because the
  * column formulation is O(planes² · flips) expression nodes (every
  * flip re-derives every plane's rank from all pairwise |dot|
  * comparisons): at the adaptive 8-plane / 8-flip geometry the probes
  * projection blew Janino's 64 KB method limit, Spark disabled
  * whole-stage codegen for the plan, and bucketing ran
  * interpreter-speed. Here rank selection and the combination odometer
  * are real loops — generated-code size is constant in the geometry.
  */
case class LshProbeBuckets(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(l: Any, r: Any, rad: Any): Any = {
    val ds = l.asInstanceOf[ArrayData]
    val flips = r.asInstanceOf[Int]
    val radius = rad.asInstanceOf[Int]
    val n = ds.numElements()
    var bucket = 0L
    var i = 0
    while (i < n) { if (ds.getDouble(i) >= 0) bucket |= 1L << i; i += 1 }
    // rank the `flips` closest planes (selection by repeated min: flips
    // and n are both <= 64, quadratic selection beats sort setup)
    val sel = new Array[Int](flips)
    val used = new Array[Boolean](n)
    var f = 0
    while (f < flips) {
      var best = -1
      var bestAbs = Double.MaxValue
      var j = 0
      while (j < n) {
        if (!used(j)) {
          val a = math.abs(ds.getDouble(j))
          if (a < bestAbs) { bestAbs = a; best = j }
        }
        j += 1
      }
      used(best) = true
      sel(f) = best
      f += 1
    }
    // total probes: 1 + sum_{s=1..radius} C(flips, s)
    var total = 1
    var binom = 1L
    var s = 1
    while (s <= radius && s <= flips) {
      binom = binom * (flips - s + 1) / s
      total += binom.toInt
      s += 1
    }
    val out = new Array[Long](total)
    out(0) = bucket
    var w = 1
    val idx = new Array[Int](math.max(radius, 1))
    s = 1
    while (s <= radius && s <= flips) {
      var t = 0
      while (t < s) { idx(t) = t; t += 1 }
      var done = false
      while (!done) {
        var m = bucket
        var u = 0
        while (u < s) { m ^= 1L << sel(idx(u)); u += 1 }
        out(w) = m
        w += 1
        var p = s - 1
        while (p >= 0 && idx(p) == flips - s + p) p -= 1
        if (p < 0) done = true
        else {
          idx(p) += 1
          var q = p + 1
          while (q < s) { idx(q) = idx(q - 1) + 1; q += 1 }
        }
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ds, flips, radius) => {
      val n = ctx.freshName("n")
      val bucket = ctx.freshName("bucket")
      val out = ctx.freshName("out")
      val sel = ctx.freshName("sel")
      val used = ctx.freshName("used")
      val i = ctx.freshName("i")
      val f = ctx.freshName("f")
      val j = ctx.freshName("j")
      val best = ctx.freshName("best")
      val bestAbs = ctx.freshName("bestAbs")
      val a = ctx.freshName("a")
      val total = ctx.freshName("total")
      val binom = ctx.freshName("binom")
      val s = ctx.freshName("s")
      val idx = ctx.freshName("idx")
      val t = ctx.freshName("t")
      val done = ctx.freshName("done")
      val m = ctx.freshName("m")
      val u = ctx.freshName("u")
      val p = ctx.freshName("p")
      val q = ctx.freshName("q")
      val w = ctx.freshName("w")
      s"""
         |int $n = $ds.numElements();
         |long $bucket = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($ds.getDouble($i) >= 0) $bucket |= 1L << $i;
         |}
         |int[] $sel = new int[$flips];
         |boolean[] $used = new boolean[$n];
         |for (int $f = 0; $f < $flips; $f++) {
         |  int $best = -1;
         |  double $bestAbs = Double.MAX_VALUE;
         |  for (int $j = 0; $j < $n; $j++) {
         |    if (!$used[$j]) {
         |      double $a = java.lang.Math.abs($ds.getDouble($j));
         |      if ($a < $bestAbs) { $bestAbs = $a; $best = $j; }
         |    }
         |  }
         |  $used[$best] = true;
         |  $sel[$f] = $best;
         |}
         |int $total = 1;
         |long $binom = 1L;
         |for (int $s = 1; $s <= $radius && $s <= $flips; $s++) {
         |  $binom = $binom * ($flips - $s + 1) / $s;
         |  $total += (int) $binom;
         |}
         |long[] $out = new long[$total];
         |$out[0] = $bucket;
         |int $w = 1;
         |int[] $idx = new int[java.lang.Math.max($radius, 1)];
         |for (int $s = 1; $s <= $radius && $s <= $flips; $s++) {
         |  for (int $t = 0; $t < $s; $t++) $idx[$t] = $t;
         |  boolean $done = false;
         |  while (!$done) {
         |    long $m = $bucket;
         |    for (int $u = 0; $u < $s; $u++) $m ^= 1L << $sel[$idx[$u]];
         |    $out[$w] = $m;
         |    $w++;
         |    int $p = $s - 1;
         |    while ($p >= 0 && $idx[$p] == $flips - $s + $p) $p--;
         |    if ($p < 0) $done = true;
         |    else {
         |      $idx[$p]++;
         |      for (int $q = $p + 1; $q < $s; $q++) $idx[$q] = $idx[$q - 1] + 1;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression)
      : LshProbeBuckets =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object LshProbe {
  // arity changed when the radius parameter landed — a fresh function
  // name, because registerOnce would keep a session's stale 2-arg
  // builder alive and silently drop the radius
  private val fnName = "graft_lsh_probe_ball"

  /** Probe count for a (flips, radius) ball, canonical bucket included.
    * Early-exits once the running total clears the 4096 kernel cap:
    * callers only compare against the cap, and summing the full series
    * for a large explicit radius at flips near 64 would overflow the
    * Long mid-series (C(64, 32) alone exceeds 2^63) — a wrapped total
    * could slip under the cap and size a negative per-row array.
    */
  def probeCount(flips: Int, radius: Int): Long = {
    var total = 1L
    var binom = 1L
    var s = 1
    while (s <= radius && s <= flips && total <= 4096) {
      binom = binom * (flips - s + 1) / s
      total += binom
      s += 1
    }
    total
  }

  /** Column API: `[bucket, ball of radius over the flips closest planes]`
    * from a dots array. `flips` must be in [0, numPlanes] and `radius`
    * in [1, flips] — the caller (resolveFlips/resolveRadius) guarantees
    * both; flips beyond the plane count would select an already-used
    * plane (best = -1) and throw. The probe-count cap fails loudly on
    * absurd geometry (the ball is exponential in radius) instead of
    * letting the explode silently multiply the corpus by thousands.
    */
  def probeBucketsFast(spark: SparkSession, ds: Column, flips: Int,
      radius: Int = 1): Column = {
    val probes = probeCount(flips, radius)
    require(probes <= 4096,
      s"probe ball too large: flips=$flips radius=$radius -> $probes " +
        "probes/vector/table (cap 4096); lower the radius or raise tables")
    CosineSimilarity.registerOnce(spark, fnName,
      exprs => LshProbeBuckets(exprs(0), exprs(1), exprs(2)))
    call_function(fnName, ds.cast("array<double>"), lit(flips), lit(radius))
  }
}
