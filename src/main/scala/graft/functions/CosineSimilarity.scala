package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: fused single-pass cosine similarity over two
  * `array<double>` columns (SURVEY.md §2.4 A11; guide preference order (b):
  * a codegen'd Expression beats composed HOFs when the composition
  * allocates).
  *
  * The higher-order-function formulation `aggregate(zip_with(a,b,*),..) /
  * (norm(a)*norm(b))` materializes an intermediate product array and walks
  * each input three times; this expression computes dot, |a|² and |b|² in
  * one loop with no allocation — the inner kernel of a 100 TB ANN scan.
  * Accumulation order is element-sequential, identical to both the HOF
  * form and DuckDB's list functions, so oracle results are unchanged.
  *
  * Zero-norm inputs yield NaN (same as the HOF form's 0/0).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are guaranteed array<double> by the cosineFast wrapper's casts
  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  double $y = $b.getDouble($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Native fused dot product over two `array<double>` columns — the
  * building block for pair scans that precompute per-vector norms once
  * (cosine = dot / (norm_a · norm_b) is then float-identical to the fused
  * [[CosineSimilarity]], same operation order on the same doubles).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** All hyperplane dots of one vector against a plane MATRIX (array of
  * array<double>) in a single call — `array<double>` of one dot per
  * plane, the bucketing projection of the LSH family.
  *
  * The matrix arrives as a nested-array literal, which Catalyst codegens
  * as ONE reference object (`ctx.addReferenceObj`) — so generated-code
  * size is CONSTANT in numPlanes × dim. The previous shape inlined every
  * plane as an element-wise literal array inside its own dot kernel;
  * at the adaptive geometry (14 tables × 8 planes × 64 dims on the 10×
  * sweep corpus) that grew the projection past Janino's 64 KB method
  * limit, Spark disabled whole-stage codegen for the plan, and the
  * heaviest relation of the pair pipeline ran interpreter-speed
  * (q64: minutes instead of seconds). Accumulation order per plane is
  * element-sequential, identical to the inlined form.
  */
case class PlaneDots(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val v = l.asInstanceOf[ArrayData]
    val m = r.asInstanceOf[ArrayData]
    val np = m.numElements()
    val out = new Array[Double](np)
    var t = 0
    while (t < np) {
      val p = m.getArray(t)
      val n = math.min(p.numElements(), v.numElements())
      var d = 0.0; var i = 0
      while (i < n) { d += p.getDouble(i) * v.getDouble(i); i += 1 }
      out(t) = d; t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, m) => {
      val np = ctx.freshName("np")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      s"""
         |int $np = $m.numElements();
         |double[] $out = new double[$np];
         |for (int $t = 0; $t < $np; $t++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $p = $m.getArray($t);
         |  int $n = java.lang.Math.min($p.numElements(), $v.numElements());
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $d += $p.getDouble($i) * $v.getDouble($i);
         |  }
         |  $out[$t] = $d;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PlaneDots =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  private val fnName = "graft_cosine"
  private val dotName = "graft_dot"

  /** Register in the session's function registry (also exposes the
    * function to SQL text as `graft_cosine(a, b)`). Idempotent: a
    * re-registration is skipped when the name already resolves —
    * `createOrReplaceTempFunction` logs a replacement WARN per call,
    * and the catalog invokes this once per query construction, which
    * polluted every bench/verify stderr tail with hundreds of lines.
    */
  private[functions] def registerOnce(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "built-in")
  }

  def register(spark: SparkSession): Unit =
    registerOnce(spark, fnName, exprs => CosineSimilarity(exprs(0), exprs(1)))

  /** Column API: fused cosine similarity (inputs cast to array<double>). */
  def cosineFast(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function(fnName, a.cast("array<double>"), b.cast("array<double>"))
  }

  /** Column API: fused dot product (inputs cast to array<double>). */
  def dotFast(spark: SparkSession, a: Column, b: Column): Column = {
    registerOnce(spark, dotName, exprs => DotProduct(exprs(0), exprs(1)))
    call_function(dotName, a.cast("array<double>"), b.cast("array<double>"))
  }

  private val planeDotsName = "graft_plane_dots"

  /** Column API: all dots of `v` against a plane matrix, one call.
    * The matrix is passed as a typedLit so it codegens as a single
    * reference object — see [[PlaneDots]] for why this matters.
    */
  def planeDotsFast(spark: SparkSession, v: Column,
      planes: Array[Array[Double]]): Column = {
    registerOnce(spark, planeDotsName, exprs => PlaneDots(exprs(0), exprs(1)))
    val matrix = org.apache.spark.sql.functions
      .typedLit[Seq[Seq[Double]]](planes.map(_.toSeq).toSeq)
    call_function(planeDotsName, v.cast("array<double>"), matrix)
  }
}
