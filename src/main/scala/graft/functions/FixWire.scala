package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: FIX checksum (tag 10) of a wire message —
  * the mod-256 sum of every byte through the SOH immediately before the
  * `10=` trailer (FIX 4.x spec, "CheckSum"). Null when the message has
  * no trailer.
  *
  * Guide preference order (b): the checksum is the hot inner loop of the
  * feed parse — per message it touches every byte, and the only pure-SQL
  * formulation (`aggregate(split(msg, ''), ...)` over per-character
  * `ascii`) walks the interpreted higher-order-function path with one
  * array element per BYTE: measured 17 µs/message at the 2M-message
  * scale probe, against the reference's declared 10M events/sec feed.
  * This expression is one fused byte loop under whole-stage codegen —
  * the same work a real FIX engine's checksum validation does.
  *
  * The trailer is located scanning BACKWARD for `<SOH>10=` (field values
  * cannot contain SOH, so the sequence is unambiguous and the last
  * occurrence is the trailer); the sum covers bytes 0..trailer-SOH
  * inclusive, per spec.
  */
case class FixChecksum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[UTF8String].getBytes
    var idx = -1
    var j = b.length - 4
    while (idx < 0 && j >= 0) {
      if (b(j) == 1 && b(j + 1) == '1' && b(j + 2) == '0' && b(j + 3) == '=')
        idx = j
      else j -= 1
    }
    if (idx < 0) null
    else {
      var s = 0
      var k = 0
      while (k <= idx) { s += b(k) & 0xff; k += 1 }
      s % 256
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val b = ctx.freshName("b")
      val idx = ctx.freshName("idx")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val s = ctx.freshName("s")
      s"""
         |byte[] $b = $in.getBytes();
         |int $idx = -1;
         |for (int $j = $b.length - 4; $j >= 0; $j--) {
         |  if ($b[$j] == 1 && $b[$j+1] == '1' && $b[$j+2] == '0' && $b[$j+3] == '=') {
         |    $idx = $j; break;
         |  }
         |}
         |if ($idx < 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $s = 0;
         |  for (int $k = 0; $k <= $idx; $k++) { $s += $b[$k] & 0xFF; }
         |  ${ev.value} = $s % 256;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): FixChecksum = copy(child = newChild)
}

object FixWire {
  private val fnName = "graft_fix_checksum"

  /** Register in the session's function registry (idempotent, the
    * [[CosineSimilarity]] pattern — also exposes SQL text
    * `graft_fix_checksum(msg)`).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(fnName)))
      reg.createOrReplaceTempFunction(
        fnName, exprs => FixChecksum(exprs.head), "built-in")
  }

  /** Column API: the message's computed tag-10 checksum (int; null when
    * the message carries no trailer).
    */
  def checksum(spark: SparkSession, msg: Column): Column = {
    register(spark)
    call_function(fnName, msg)
  }
}
