package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.sources.{BloomSkipping, DataLakehouse, TxnLog}

/** Log-side Bloom file skipping: equality lookups on a high-cardinality
  * column uncorrelated with the layout must skip files from the txn log
  * alone — the case min/max bounds structurally cannot prune. Soundness
  * (never lose a row) is the hard requirement; skipping power is the
  * measured one.
  */
class BloomSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // 100 bars across 5 dates (5 parquet files), each with a unique
  // trade_id — the needle column. fpp 1e-6 makes the negative-lookup
  // assertion deterministic in practice (P(any FP across 4 files) ~ 4e-6).
  private def newBloomLake(): DataLakehouse = {
    val lake = new DataLakehouse(spark, tempDir("bloomlake"),
      bloomCols = Seq("trade_id"), bloomFpp = 1e-6)
    val bars = (0 until 100).map { i =>
      OhlcvBar(
        symbol = s"SYM${i % 7}",
        timestamp = new Timestamp(
          ts("2024-06-10 09:30:00").getTime + (i / 20) * 86400000L + (i % 20) * 60000L),
        open = 10.0 + i, high = 15.0 + i, low = 9.0 + i, close = 12.0 + i,
        volume = 1000L + i, asset_class = AssetClass.Equity)
    }
    val df = spark.createDataset(bars).toDF()
      .withColumn("trade_id", lit(900000L) + col("volume") - 1000L)
    lake.appendDF(df)
    lake
  }

  test("point lookup scans only the file containing the id") {
    val lake = newBloomLake()
    val total = lake.query().totalRowsScanned
    assert(total == 100)
    // trade_id 900042 lives in the third date's file (i = 42)
    val r = lake.query(eq = Map("trade_id" -> 900042L))
    assert(r.totalRowsScanned == 20, s"expected one 20-row file, got ${r.totalRowsScanned}")
    val rows = r.df.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("trade_id") == 900042L)
    assert(rows.head.getAs[Double]("open") == 52.0)
  }

  test("absent id scans zero files") {
    val lake = newBloomLake()
    val r = lake.query(eq = Map("trade_id" -> 123456789L))
    assert(r.totalRowsScanned == 0)
    assert(r.df.isEmpty)
  }

  test("soundness: every present id returns exactly the full-scan rows") {
    val lake = newBloomLake()
    val full = lake.query().df.collect()
      .map(r => r.getAs[Long]("trade_id") -> r.getAs[Double]("open")).toMap
    assert(full.size == 100)
    // no false negative anywhere: every single id resolves through the
    // bloom-pruned path to its row
    (0 until 100).foreach { i =>
      val id = 900000L + i
      val got = lake.query(eq = Map("trade_id" -> id)).df.collect()
      assert(got.length == 1, s"id $id lost by pruning")
      assert(got.head.getAs[Double]("open") == full(id))
    }
  }

  test("lookups combine with symbol/time predicates") {
    val lake = newBloomLake()
    // matching symbol + id: one row; contradictory symbol: zero rows but
    // never an error — residual filters stay exact
    val hit = lake.query(symbol = Some("SYM0"),
      eq = Map("trade_id" -> 900042L))
    assert(hit.df.count() == (if (42 % 7 == 0) 1 else 0))
    val miss = lake.query(symbol = Some("SYM1"),
      eq = Map("trade_id" -> 900042L))
    assert(miss.df.count() == 0)
  }

  test("blooms survive a checkpoint and a cold txn-log start") {
    val lake = newBloomLake()
    // push past the checkpoint interval (10) with small appends
    (0 until 11).foreach { j =>
      val df = spark.createDataset(Seq(OhlcvBar("ZZZ",
        ts("2024-07-01 10:00:00"), 1.0, 2.0, 0.5, 1.5, 10L,
        AssetClass.Equity))).toDF()
        .withColumn("trade_id", lit(7000000L + j))
      lake.appendDF(df)
    }
    // a COLD instance must resolve blooms from checkpoint + tail
    val cold = new DataLakehouse(spark, lake.root,
      bloomCols = Seq("trade_id"), bloomFpp = 1e-6)
    val r = cold.query(eq = Map("trade_id" -> 900042L))
    assert(r.totalRowsScanned == 20)
    assert(r.df.count() == 1)
    val late = cold.query(eq = Map("trade_id" -> 7000005L))
    assert(late.totalRowsScanned == 1)
    assert(late.df.count() == 1)
  }

  test("compaction rewrites keep bloom skipping") {
    val lake = newBloomLake()
    lake.compact()
    val r = lake.query(eq = Map("trade_id" -> 900042L))
    assert(r.df.count() == 1)
    // rewritten files carry fresh filters: the other dates' files skip
    assert(r.totalRowsScanned < 100)
  }

  test("type-evolution guard: mismatched probe type never prunes") {
    // a filter recorded over int values must answer "might contain" for
    // a probe that cannot be losslessly represented as int
    val b = TxnLog.Bloom(64, 3, "int", java.util.Base64.getEncoder
      .encodeToString(new Array[Byte](8))) // all-zero filter
    assert(!BloomSkipping.mightContain(b, 5)) // int probe: filter applies
    assert(BloomSkipping.mightContain(b, "not an int")) // mismatch: read it
  }

  test("params: sizing follows the standard formulas, clamped") {
    val (m, k) = BloomSkipping.params(1000, 0.01, 1 << 22)
    assert(m >= 9500 && m <= 9664 && m % 64 == 0) // -n ln p / ln^2 2 ≈ 9585
    assert(k == 7) // (m/n) ln 2
    val (mCap, kCap) = BloomSkipping.params(10000000L, 0.0001, 1 << 20)
    assert(mCap == (1 << 20)) // clamped
    assert(kCap >= 1)
  }

  test("no bloomCols: commits carry no filters, eq still answers exactly") {
    val lake = new DataLakehouse(spark, tempDir("nobloom"))
    val df = spark.createDataset((0 until 10).map(i =>
      OhlcvBar("AAA", new Timestamp(ts("2024-06-10 09:30:00").getTime + i * 1000L),
        1.0, 2.0, 0.5, 1.5, 100L + i, AssetClass.Equity))).toDF()
      .withColumn("trade_id", col("volume"))
    lake.appendDF(df)
    assert(lake.txnLog.bloomsAt().isEmpty)
    val r = lake.query(eq = Map("trade_id" -> 105L))
    assert(r.df.count() == 1) // residual filter alone, full scan
    assert(r.totalRowsScanned == 10)
  }
}
