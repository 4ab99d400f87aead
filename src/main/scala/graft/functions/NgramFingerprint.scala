package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass bottom-k byte-n-gram fingerprint (fast path of
  * [[TextOps.fingerprint]]): slides an n-byte window over the UTF8 bytes,
  * hashes each window in place with xxhash64 (seed 42 — identical hashes
  * to Spark's `xxhash64` over `substring`), and keeps the k smallest
  * distinct values via a bounded insertion buffer.
  *
  * vs the HOF form (transform + array_distinct + array_sort + slice):
  * zero intermediate arrays/substrings — O(len·k) with one k-long output.
  * For pure-ASCII text the result equals the char-based HOF form exactly
  * (asserted in tests); for multi-byte UTF-8 the windows are byte-aligned
  * rather than char-aligned (documented tradeoff of the fast path).
  */
case class NgramFingerprint(child: Expression, n: Int, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val len = s.numBytes()
    val buf = new Array[Long](k)
    var used = 0
    var i = 0
    while (i <= len - n) {
      val h = XXH64.hashUnsafeBytes(base, offset + i, n, 42L)
      // bounded ascending insertion, skipping duplicates
      if (used < k || h < buf(used - 1)) {
        var lo = 0
        while (lo < used && buf(lo) < h) lo += 1
        if (lo >= used || buf(lo) != h) { // not a duplicate
          val insertAt = lo
          val newUsed = math.min(used + 1, k)
          var j = newUsed - 1
          while (j > insertAt) { buf(j) = buf(j - 1); j -= 1 }
          if (insertAt < k) buf(insertAt) = h
          used = newUsed
        }
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, used))
  }

  override protected def withNewChildInternal(newChild: Expression): NgramFingerprint =
    copy(child = newChild)
}

object NgramFingerprint {
  /** Column API via the session function registry (idempotent, the
    * [[CosineSimilarity]] pattern — re-registration logs a WARN per
    * call and the catalog invokes this per query construction).
    */
  def fingerprintFast(spark: SparkSession, text: Column, n: Int = 8,
      k: Int = 16): Column = {
    val fn = s"graft_fingerprint_${n}_$k"
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(fn)))
      reg.createOrReplaceTempFunction(
        fn, exprs => NgramFingerprint(exprs.head, n, k), "built-in")
    call_function(fn, text)
  }
}
