package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables (SURVEY.md §4 partitioning/shuffle): pre-shuffle a
  * table ONCE at write time into N hash buckets on the join/agg key, so
  * every later equi-join or aggregation on that key runs with zero
  * exchange — the write-amortized co-location strategy for the joins a
  * 100 TB pipeline repeats daily (orders⋈lineitem, doc⋈embedding).
  *
  * Spark requires the catalog (saveAsTable) for bucket metadata; plain
  * `.parquet(path)` writes cannot record bucket specs.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted catalog table. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int,
      path: Option[String] = None): Unit = {
    val w = df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket keys. With matching
    * bucket counts Spark plans a sort-merge join with NO shuffle exchange
    * on either side (asserted in tests).
    */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      leftKey: String,
      rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
