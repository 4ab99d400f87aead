package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the canonical market-data join (SURVEY.md §2.3 J5): for each
  * left row, the single latest right row with `rightOn <= leftOn` within the
  * same key group (backward direction).
  *
  * Spark has no built-in as-of join; this uses the union-tagged sort
  * formulation (SURVEY §2.3 preference order (a): compose existing ops):
  * both sides are tagged and unioned on a common schema, and one
  * key-partitioned window ordered by (ts, side, tieBreaker) computes
  * `last(rightPayload, ignoreNulls)` over a running frame — each left row
  * reads the newest right payload at-or-before its timestamp.
  *
  * Scale shape: ONE shuffle (the key partition) and a per-partition sort,
  * linear in |left| + |right|. The previous formulation — range join then
  * `row_number` — materialized every right row <= t per left row (per-key
  * O(|left|·|right|), quadratic on active keys) and re-shuffled for a
  * window keyed by left id; this one has no join node at all.
  *
  * The right payload travels as a single struct, so all right columns come
  * atomically from the SAME right row (per-column `last(ignoreNulls)`
  * would mix rows when a right column is genuinely null in the newest
  * match).
  *
  * Requirements:
  *  - right columns must not collide with left columns (pre-rename).
  *  - `tieBreaker` makes the pick deterministic when right timestamps tie
  *    (max tieBreaker wins, matching ORDER BY ts DESC, tieBreaker DESC /
  *    row_number = 1).
  *  - `leftId` is retained from the operator contract (left rows are
  *    uniquely identified) but the union formulation no longer partitions
  *    by it.
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
    require(left.columns.contains(leftId), s"missing left id column $leftId")
    val leftCols = left.columns.toSeq
    val rightKeyNames = keys.map(_._2)
    val payloadCols = right.columns.toSeq.filterNot(rightKeyNames.contains)

    // Right side: key cols (under the LEFT key names), event time, side 0,
    // tie-break, and the whole payload as one struct. Null keys / null
    // event times are dropped FIRST — under the old equi-join they could
    // never match (null comparisons are null), but in the union form a
    // null-ts row would sort nulls-FIRST and a null key would share a
    // window partition with null-key left rows, fabricating matches.
    // The union formulation needs EXACT dtype agreement between the two
    // sides' key/ts columns (unionByName does not coerce, unlike the join
    // operators this replaced) — right columns are cast to the left's
    // dtypes, which drive the operator's schema. One mismatch shape is
    // dangerous: an INTEGRAL NARROWING (right long → left int), where a
    // bare cast of an out-of-range value either WRAPS it into a spurious
    // match (non-ANSI: long 4294967297 cast to int becomes 1) or THROWS
    // (ANSI). Only for those pairs does the try_cast round-trip guard
    // apply (cast to the left type and back must be the identity;
    // out-of-range → null → dropped): in-range integrals round-trip
    // unchanged, so no genuine match is lost. Lossy-but-valid
    // conversions (timestamp→date, double→float, non-canonical strings)
    // deliberately do NOT get the guard — their round trip is not the
    // identity even for values that legitimately match after the cast,
    // so guarding them would drop genuine matches; they keep the plain
    // cast's match-on-converted-value semantics.
    val intWidth: Map[org.apache.spark.sql.types.DataType, Int] = Map(
      org.apache.spark.sql.types.ByteType -> 1,
      org.apache.spark.sql.types.ShortType -> 2,
      org.apache.spark.sql.types.IntegerType -> 4,
      org.apache.spark.sql.types.LongType -> 8)
    val roundTripSafe = (keys.map { case (l, r) => (r, l) } :+
        (rightOn -> leftOn))
      .collect { case (r, l)
          if intWidth.get(right.schema(r).dataType).exists(rw =>
            intWidth.get(left.schema(l).dataType).exists(_ < rw)) =>
        right(r).try_cast(left.schema(l).dataType)
          .try_cast(right.schema(r).dataType) === right(r)
      }
    val rMatchable = right.filter(
      (keys.map(k => right(k._2).isNotNull) :+ right(rightOn).isNotNull)
        .concat(roundTripSafe)
        .reduce(_ && _))
    val rTagged = rMatchable.select(
      keys.map { case (l, r) =>
        right(r).cast(left.schema(l).dataType).as(s"__k_$l") } ++ Seq(
        right(rightOn).cast(left.schema(leftOn).dataType).as("__ts"),
        lit(0).as("__side"),
        right(tieBreaker).as("__tb"),
        struct(payloadCols.map(c => right(c).as(c)): _*).as("__pay")): _*)
    val payType = rTagged.schema("__pay").dataType
    val tbType = rTagged.schema("__tb").dataType

    val lTagged = left.select(
      keys.map { case (l, _) => left(l).as(s"__k_$l") } ++ Seq(
        left(leftOn).as("__ts"),
        lit(1).as("__side"),
        lit(null).cast(tbType).as("__tb"),
        lit(null).cast(payType).as("__pay")) ++
        leftCols.map(c => left(c).as(s"__l_$c")): _*)
    val rAligned = rTagged.select(
      rTagged.columns.map(col) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType)
          .as(s"__l_$c")): _*)

    // Running last-non-null over (key) ordered by (ts, side, tieBreaker):
    // side 0 < 1 puts a right row at ts == leftOn BEFORE the left row
    // (backward join is inclusive); ascending tieBreaker makes the LAST
    // right row in a ts tie the max-tieBreaker one.
    val w = Window.partitionBy(keys.map(k => col(s"__k_${k._1}")): _*)
      .orderBy(col("__ts"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged.unionByName(rAligned)
      .withColumn("__match", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l_$c").as(c)) ++
        payloadCols.map(c => col(s"__match.$c").as(c)): _*)
  }
}
