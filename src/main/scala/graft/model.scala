package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core data model (SURVEY.md §1): Spark-typed equivalents of the
  * reference's record classes (lakehouse.py:41-140), with native Parquet
  * timestamps instead of the reference's ISO-8601 strings
  * (lakehouse.py:542,551 — intentional improvement, FIXTURES.md).
  */

/** Asset classes (lakehouse.py:41-47). Spark has no enum type; the column
  * is a StringType with a domain check (model.assetClassValid).
  */
object AssetClass {
  val Equity = "equity"
  val Option = "option"
  val Future = "future"
  val Forex = "forex"
  val Crypto = "crypto"
  val all: Seq[String] = Seq(Equity, Option, Future, Forex, Crypto)
}

/** OHLCV bar (lakehouse.py:50-71). */
final case class OhlcvBar(
    symbol: String,
    timestamp: Timestamp,
    open: Double,
    high: Double,
    low: Double,
    close: Double,
    volume: Long,
    asset_class: String)

/** Tick record from the declared surface (README.md:72-74): epoch-ns kept
  * as Long — Spark TimestampType is µs (SURVEY.md §7.4).
  */
final case class TickData(ts_ns: Long, symbol: String, price: Double, volume: Long)

/** Query result wrapper (lakehouse.py:108-124): the DataFrame plus query
  * timing and scan accounting (rows in the pruned file set, from parquet
  * footer metadata — no data IO).
  */
final case class QueryResult(df: DataFrame, queryTimeMs: Double, totalRowsScanned: Long) {
  def count: Long = df.count()
}

/** Ingestion statistics (lakehouse.py:127-140). */
final case class IngestionStats(
    rowsIngested: Long,
    partitionsWritten: Long,
    elapsedMs: Double,
    errors: Long)

object model {
  /** Storage schema (FIXTURES.md "engine-canonical"): the OhlcvBar columns
    * plus the yyyy-MM-dd `date` partition column (lakehouse.py:22,156-165).
    */
  val ohlcvSchema: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false),
    StructField("open", DoubleType, nullable = false),
    StructField("high", DoubleType, nullable = false),
    StructField("low", DoubleType, nullable = false),
    StructField("close", DoubleType, nullable = false),
    StructField("volume", LongType, nullable = false),
    StructField("asset_class", StringType, nullable = false)))

  /** Constraint predicate (lakehouse.py:73-88, P5): high >= low,
    * open/close within [low, high], volume >= 0, known asset class.
    * One boolean Column — codegen'd, applied as a vectorized filter.
    */
  def barValid: Column =
    // symbol/timestamp null checks agree with the driver-side isValid:
    // a null-timestamp bar derives a null date key and lands in the
    // default-null partition, invisible to every date-pruned read
    col("symbol").isNotNull && col("timestamp").isNotNull &&
      (col("high") >= col("low")) &&
      col("open").between(col("low"), col("high")) &&
      col("close").between(col("low"), col("high")) &&
      (col("volume") >= 0) &&
      col("asset_class").isin(AssetClass.all: _*)

  /** Partition key derivation (lakehouse.py:156-165): UTC calendar date.
    * Derived with epoch-day arithmetic — `unix_seconds` and
    * `date_from_unix_date` are timezone-FREE, unlike `date_format`, which
    * renders in `spark.sql.session.timeZone` and would write partition
    * keys that disagree with the (UTC-pinned) pruning twin [[dateKeyOf]]
    * in any non-UTC session, silently dropping day-boundary rows from
    * range queries.
    */
  def dateKey: Column =
    date_from_unix_date(
      floor(unix_seconds(col("timestamp")) / 86400.0).cast(IntegerType))
      .cast(StringType)

  /** Driver-side twin of [[dateKey]] for pruning arithmetic (UTC). */
  def dateKeyOf(ts: Timestamp): String =
    java.time.Instant.ofEpochMilli(ts.getTime)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
}
