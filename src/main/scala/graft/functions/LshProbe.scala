package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** QUERY-DIRECTED MULTI-PROBE bucket set from a hyperplane dots array
  * (Lv et al., "Multi-probe LSH: efficient indexing for high-dimensional
  * similarity search", VLDB 2007, adapted to sign-pattern buckets):
  * `array<long>` of `1 + flips` buckets — the canonical sign-pattern
  * bucket first, then the buckets reached by flipping the sign bit of
  * the planes the vector is CLOSEST to (smallest |dot|, ties by plane
  * index) — exactly the planes a true neighbor most plausibly sits
  * across. Bit-for-bit identical to the canonical bucketing rule
  * (`ds[i] >= 0 → bit i`), so probe rows join durable indexes built by
  * any earlier run.
  *
  * Native expression rather than composed `when` columns because the
  * column formulation is O(planes² · flips) expression nodes (every
  * flip re-derives every plane's rank from all pairwise |dot|
  * comparisons): at the adaptive 8-plane / 8-flip geometry the probes
  * projection blew Janino's 64 KB method limit, Spark disabled
  * whole-stage codegen for the plan, and bucketing ran
  * interpreter-speed. Here the rank selection is a real loop —
  * generated-code size is constant in the geometry.
  */
case class LshProbeBuckets(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val ds = l.asInstanceOf[ArrayData]
    val flips = r.asInstanceOf[Int]
    val n = ds.numElements()
    var bucket = 0L
    var i = 0
    while (i < n) { if (ds.getDouble(i) >= 0) bucket |= 1L << i; i += 1 }
    val out = new Array[Long](1 + flips)
    out(0) = bucket
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
      out(1 + f) = bucket ^ (1L << best)
      f += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ds, flips) => {
      val n = ctx.freshName("n")
      val bucket = ctx.freshName("bucket")
      val out = ctx.freshName("out")
      val used = ctx.freshName("used")
      val i = ctx.freshName("i")
      val f = ctx.freshName("f")
      val j = ctx.freshName("j")
      val best = ctx.freshName("best")
      val bestAbs = ctx.freshName("bestAbs")
      val a = ctx.freshName("a")
      s"""
         |int $n = $ds.numElements();
         |long $bucket = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($ds.getDouble($i) >= 0) $bucket |= 1L << $i;
         |}
         |long[] $out = new long[1 + $flips];
         |$out[0] = $bucket;
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
         |  $out[1 + $f] = $bucket ^ (1L << $best);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LshProbeBuckets =
    copy(left = newLeft, right = newRight)
}

object LshProbe {
  private val fnName = "graft_lsh_probe_buckets"

  /** Column API: `[bucket, flip_1 … flip_flips]` from a dots array.
    * `flips` must be in [0, numPlanes] — the caller (resolveFlips)
    * guarantees it; flips beyond the plane count would select an
    * already-used plane (best = -1) and throw.
    */
  def probeBucketsFast(spark: SparkSession, ds: Column, flips: Int): Column = {
    CosineSimilarity.registerOnce(spark, fnName,
      exprs => LshProbeBuckets(exprs(0), exprs(1)))
    call_function(fnName, ds.cast("array<double>"), lit(flips))
  }
}
