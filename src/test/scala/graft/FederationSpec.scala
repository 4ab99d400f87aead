package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import scala.sys.process._

import com.fasterxml.jackson.databind.ObjectMapper

import graft.sources.DataLakehouse

/** The DuckDB federation tier (reference README.md:30,45-47: "DuckDB for
  * interactive queries, Spark for distributed processing"), proven on one
  * table: `duckdbManifest(version)` pins the txn log's exact live-file
  * list as a DuckDB view, and the SAME SQL text answers identically
  * through `lake.sql` (Spark) and `tools/duck_query.py` (DuckDB). DuckDB
  * runs out-of-process via python3 — exactly the interactive client the
  * reference describes — so these tests cancel (never silently pass)
  * when that runtime is absent.
  */
class FederationSpec extends SparkSpec {

  private lazy val duckdbAvailable: Boolean =
    try Seq("python3", "-c", "import duckdb").! == 0
    catch { case _: Exception => false }

  private def ts(s: String) = Timestamp.valueOf(s)

  private def bar(i: Int): OhlcvBar = OhlcvBar(
    symbol = if (i % 2 == 0) "AAPL" else "GOOGL",
    // two date partitions: i < 12 on 06-15, rest on 06-16
    timestamp = new Timestamp(ts("2024-06-15 09:30:00").getTime + i * 3600L * 1000),
    open = 150.0 + i, high = 155.25 + i, low = 149.5 + i, close = 153.75 + i,
    volume = 1000000L + 1000L * i, asset_class = AssetClass.Equity)

  private def populatedLake(fmt: String = "parquet"): DataLakehouse = {
    val lake = new DataLakehouse(spark, tempDir("fed"), format = fmt)
    lake.ingestBatch((0 until 24).map(bar))
    lake.flush()
    lake
  }

  /** Run `sql` against `manifest` through the interactive runner; returns
    * (columns, rows) with every value stringified.
    */
  private def duck(manifest: java.nio.file.Path, sql: String)
      : (Seq[String], Seq[Seq[String]]) = {
    val out = Seq("python3", "tools/duck_query.py", manifest.toString, sql,
      "--json").!!
    val node = new ObjectMapper().readTree(out)
    import scala.jdk.CollectionConverters._
    (node.get("columns").elements().asScala.map(_.asText()).toSeq,
      node.get("rows").elements().asScala
        .map(_.elements().asScala.map(_.asText()).toSeq).toSeq)
  }

  /** Run the same text through the engine's SQL surface, stringified the
    * same way python's str() renders (BigDecimal keeps scale, so decimal
    * columns print identically on both sides).
    */
  private def sparkSql(lake: DataLakehouse, sql: String)
      : (Seq[String], Seq[Seq[String]]) = {
    val df = lake.sql(sql)
    (df.columns.toSeq,
      df.collect().toSeq.map(_.toSeq.map(v => if (v == null) "" else v.toString)))
  }

  // The identical-answer gate: three catalog-shaped queries (grouped agg,
  // filtered per-partition stats, window rank), ONE SQL text each, valid
  // in both dialects. Decimal casts per the FIXTURES.md determinism
  // contract (exact min/max/sum — no float-accumulation ambiguity).
  private val federatedQueries = Seq(
    "SELECT symbol, count(*) AS n, sum(volume) AS vol " +
      "FROM trades GROUP BY symbol ORDER BY symbol",
    "SELECT date, CAST(min(low) AS DECIMAL(18,4)) AS lo, " +
      "CAST(max(high) AS DECIMAL(18,4)) AS hi, count(*) AS n " +
      "FROM trades WHERE symbol = 'AAPL' GROUP BY date ORDER BY date",
    "SELECT symbol, date, vol FROM (SELECT symbol, date, " +
      "sum(volume) OVER (PARTITION BY symbol ORDER BY timestamp) AS vol, " +
      "row_number() OVER (PARTITION BY symbol ORDER BY timestamp DESC) AS rn " +
      "FROM trades) t WHERE rn = 1 ORDER BY symbol")

  test("manifest embeds exactly the snapshot's live files, absolute and sorted") {
    val lake = populatedLake()
    // make version 1 so the pin is meaningful
    lake.ingestBatch(Seq(bar(100))); lake.flush()
    val v = lake.txnLog.currentVersion()
    val manifest = lake.duckdbManifest()
    val text = new String(Files.readAllBytes(manifest), "UTF-8")
    val quoted = "'([^']+\\.(?:parquet|csv))'".r
      .findAllMatchIn(text).map(_.group(1)).toSeq
    val expected = lake.txnLog.snapshotFiles(v)
      .map(rel => Paths.get(lake.root).resolve(rel).toString).sorted
    assert(quoted == expected)
    assert(text.contains(s"version: $v"))
    // lands under the _duckdb metadata dir, outside vacuum's data sweep
    assert(manifest.toString.contains("/_duckdb/"))
  }

  test("same SQL text answers identically via Spark and DuckDB") {
    assume(duckdbAvailable, "python3+duckdb not present")
    val lake = populatedLake()
    val manifest = lake.duckdbManifest()
    federatedQueries.foreach { q =>
      val (dCols, dRows) = duck(manifest, q)
      val (sCols, sRows) = sparkSql(lake, q)
      assert(dCols == sCols, s"column mismatch for: $q")
      assert(dRows == sRows, s"value mismatch for: $q")
      assert(dRows.nonEmpty)
    }
  }

  test("manifest is a pinned snapshot: stale manifest keeps its version, re-emit follows head") {
    assume(duckdbAvailable, "python3+duckdb not present")
    val lake = populatedLake()
    val m0 = lake.duckdbManifest()
    val count = "SELECT count(*) AS n FROM trades"
    assert(duck(m0, count)._2 == Seq(Seq("24")))
    // concurrent Spark-side writes: an append and a copy-on-write delete
    lake.ingestBatch((100 to 103).map(bar)); lake.flush()
    lake.deleteWhere(org.apache.spark.sql.functions.col("symbol") === "GOOGL")
    // the old manifest still answers from its pinned version (files are
    // immutable; retention has not passed) ...
    assert(duck(m0, count)._2 == Seq(Seq("24")))
    // ... and a re-emitted manifest sees the head snapshot
    val m1 = lake.duckdbManifest()
    val headN = lake.query().df.count().toString
    assert(duck(m1, count)._2 == Seq(Seq(headN)))
    assert(m1 != m0) // version-stamped filename: pins never overwrite
  }

  test("explicit version pin exports time travel to DuckDB") {
    assume(duckdbAvailable, "python3+duckdb not present")
    val lake = populatedLake()
    val v0 = lake.txnLog.currentVersion()
    lake.ingestBatch((100 to 105).map(bar)); lake.flush()
    val mOld = lake.duckdbManifest(version = v0)
    val mNew = lake.duckdbManifest()
    val count = "SELECT count(*) AS n FROM trades"
    assert(duck(mOld, count)._2 == Seq(Seq("24")))
    assert(duck(mNew, count)._2 == Seq(Seq("30")))
  }

  test("array<float> embedding column federates (vector-table shape)") {
    assume(duckdbAvailable, "python3+duckdb not present")
    // The embeddings-table shape: an ArrayType(FloatType) data column.
    // Data-column types never touch duckdbManifest's hive_types map —
    // DuckDB reads them from the parquet footer as LIST(FLOAT) — so the
    // duckType fallthrough (`other.sql`) is only ever reached by
    // PARTITION columns, which are scalar by construction (arrays
    // cannot be partition keys; the remaining exotic scalar, DECIMAL,
    // round-trips because Spark's `.sql` name IS the DuckDB spelling).
    // Array element access and length are dialect-split (DuckDB
    // 1-based [i]/len, Spark 0-based [i]/size), so this test compares
    // VALUES of equivalent texts instead of one shared text. Elements
    // are multiples of 0.25 — float32-exact, so both engines sum
    // identical doubles and the DECIMAL casts must match bit-for-bit.
    import spark.implicits._
    val lake = new DataLakehouse(spark, tempDir("fedvec"))
    val df = (0 until 32).map { i =>
      (s"V$i", ts("2024-06-15 09:30:00"),
        Array.tabulate(8)(j => (i + j) * 0.25f))
    }.toDF("symbol", "timestamp", "embedding")
    lake.appendDF(df)
    val manifest = lake.duckdbManifest()
    val (dCols, dRows) = duck(manifest,
      "SELECT count(*) AS n, " +
        "CAST(sum(embedding[1]) AS DECIMAL(18,4)) AS s0, " +
        "CAST(sum(len(embedding)) AS BIGINT) AS dims FROM trades")
    val (sCols, sRows) = sparkSql(lake,
      "SELECT count(*) AS n, " +
        "CAST(sum(embedding[0]) AS DECIMAL(18,4)) AS s0, " +
        "CAST(sum(size(embedding)) AS BIGINT) AS dims FROM trades")
    assert(dCols == sCols)
    assert(dRows == sRows, s"duck=$dRows spark=$sRows")
    assert(dRows.head.head == "32")
    // per-row access agrees too: the max of the last element
    val (_, dMax) = duck(manifest,
      "SELECT CAST(max(embedding[8]) AS DECIMAL(18,4)) AS m FROM trades")
    val (_, sMax) = sparkSql(lake,
      "SELECT CAST(max(embedding[7]) AS DECIMAL(18,4)) AS m FROM trades")
    assert(dMax == sMax, s"duck=$dMax spark=$sMax")
  }

  test("csv-format table federates through read_csv") {
    assume(duckdbAvailable, "python3+duckdb not present")
    val lake = populatedLake(fmt = "csv")
    val manifest = lake.duckdbManifest()
    assert(new String(Files.readAllBytes(manifest), "UTF-8").contains("read_csv"))
    val q = "SELECT symbol, count(*) AS n, sum(volume) AS vol " +
      "FROM trades GROUP BY symbol ORDER BY symbol"
    val (_, dRows) = duck(manifest, q)
    val (_, sRows) = sparkSql(lake, q)
    assert(dRows == sRows)
  }
}
