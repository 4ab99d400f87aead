package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the canonical market-data join (SURVEY.md §2.3 J5): for each
  * left row, the single latest right row with `rightOn <= leftOn` within the
  * same key group (backward direction).
  *
  * Spark has no built-in as-of join; this composes an equi-key range join
  * with a `row_number()` window (SURVEY §2.3 preference order (a): compose
  * existing ops). At scale both sides shuffle once on the key — the same
  * exchange the subsequent window reuses (Catalyst recognizes the
  * co-partitioning, so no second shuffle for the window when the join output
  * is hash-partitioned by the window's partition key prefix).
  *
  * Requirements:
  *  - `leftId` uniquely identifies left rows (window partition key).
  *  - right columns must not collide with left columns (pre-rename).
  *  - `tieBreaker` makes the pick deterministic when right timestamps tie.
  */
object AsOfJoin {
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)], // (leftKeyCol, rightKeyCol)
      leftOn: String,
      rightOn: String,
      leftId: String,
      tieBreaker: String): DataFrame = {
    val keyCond = keys.map { case (l, r) => left(l) === right(r) }
      .reduce(_ && _)
    val cond = keyCond && (right(rightOn) <= left(leftOn))
    val joined = left.join(right, cond, "left")
    val w = Window.partitionBy(left(leftId))
      .orderBy(right(rightOn).desc, right(tieBreaker).desc)
    joined
      .withColumn("__asof_rn", row_number().over(w))
      .filter(col("__asof_rn") === 1)
      .drop("__asof_rn")
      .drop(keys.map(_._2): _*)
  }
}
