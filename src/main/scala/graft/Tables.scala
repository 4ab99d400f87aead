package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-data table loader for the driver's synthetic star schema
  * (TESTDATA.md). One parquet file per table under the given sf dir.
  *
  * `events.ts` is stored as parquet timestamp[ns]; Spark's TimestampType is
  * µs-precision and Spark 4.x refuses TIMESTAMP(NANOS) outright
  * (PARQUET_TYPE_ILLEGAL) unless `spark.sql.legacy.parquet.nanosAsLong` is
  * set, which reads the column as a raw epoch-ns Long (SURVEY.md §7.4 — same
  * ns-vs-µs boundary as the reference's TickData, README.md:72-74). We keep
  * the raw ns as `ts_ns` and derive a µs-floor `ts` TimestampType column —
  * matching DuckDB's `epoch_us` floor on TIMESTAMP_NS, so oracle queries
  * compare identically.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      import org.apache.spark.sql.functions.{expr, timestamp_micros}
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // DuckDB 1.0 truncates parquet timestamp[ns] to µs TIMESTAMP on read,
      // so epoch-µs (`ts_us`) is the portable event-time resolution for
      // oracle queries; `ts_ns` keeps full fidelity for engine-side use.
      spark.read.parquet(s"$sfDir/events.parquet")
        .withColumnRenamed("ts", "ts_ns")
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register every table as a temp view (SURVEY §2.1 S12 table registry). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
