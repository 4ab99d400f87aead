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
  private def registerOnce(spark: SparkSession, name: String,
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
}
