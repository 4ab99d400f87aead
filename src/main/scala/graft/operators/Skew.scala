package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §4 "partitioning/shuffle"; the 100 TB
  * toolkit): when one key owns a disproportionate share of rows, a plain
  * shuffle sends it to one reducer. AQE's skew-join splitting handles the
  * sort-merge case automatically; these helpers cover the two shapes AQE
  * does not: aggregations over skewed keys, and joins where the build side
  * must be replicated rather than split.
  *
  * Results are provably identical to the unsalted forms (asserted by
  * tests) — salting only changes the exchange topology.
  */
object Skew {

  /** Two-phase (salted) aggregation: partial aggregate on (keys, salt) —
    * spreading a hot key over `salts` reducers — then final aggregate on
    * the keys. Valid for any algebraic aggregate; exposed for sum/count.
    */
  def saltedSumCount(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      salts: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    salted
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("cnt"))
  }

  /** Salted equi-join: the big (skewed) side gets a row-local salt; the
    * small side is replicated once per salt value; the join key becomes
    * (key, salt) so a hot key fans out over `salts` tasks. Use when the
    * small side is too big to broadcast but the big side's key is skewed.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      salts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedSmall,
        saltedBig(bigKey) === replicatedSmall(smallKey) &&
          saltedBig("__salt") === replicatedSmall("__salt"))
      .drop("__salt")
  }
}
