package graft

import java.sql.Timestamp

import graft.sources.DataLakehouse

/** Batch change-data-feed (`DataLakehouse.changes` — the Delta CDF
  * analog). Pins the three contracts that matter at scale:
  *
  *  1. pure-append ranges read ONLY the net-added files (zero IO
  *     against the old snapshot) — asserted via `inputFiles`;
  *  2. a pure compaction yields ZERO row changes (files churned, rows
  *     identical);
  *  3. row ops surface as their exact row-level deltas: DELETE as
  *     `delete` rows, UPDATE as its delete+insert pair.
  */
class ChangeFeedSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def bar(sym: String, t: String, close: Double = 153.0): OhlcvBar =
    OhlcvBar(symbol = sym, timestamp = ts(t),
      open = 150.0, high = 155.0, low = 149.0, close = close,
      volume = 1000L, asset_class = AssetClass.Equity)

  private def seeded(): DataLakehouse = {
    val lake = new DataLakehouse(spark, tempDir("cdf"))
    lake.ingestBatch(Seq(
      bar("AAPL", "2024-06-15 09:30:00"), bar("AAPL", "2024-06-15 10:30:00"),
      bar("GOOGL", "2024-06-15 09:30:00")))
    lake.ingestBatch(Seq(
      bar("AAPL", "2024-06-16 09:30:00"), bar("GOOGL", "2024-06-16 10:30:00")))
    lake
  }

  test("append-only range: inserts only, and ONLY the added files are read") {
    val lake = seeded()
    val v1 = 0L // after first ingest commit (version 0)
    val all = lake.changes(-1L)
    assert(all.count() === 5)
    assert(all.select("_change_type").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("insert"))

    // Range covering only the second commit: exactly its 2 rows...
    val second = lake.changes(v1)
    assert(second.count() === 2)
    assert(second.collect().map(_.getAs[Timestamp]("timestamp")).forall(
      _.toString.startsWith("2024-06-16")))
    // ...and the scan's input files are exactly the files that commit
    // added — nothing of the old snapshot is touched (the 100-TB
    // contract: CDF over appends is log + new files, not a table read).
    val addedByV1 = lake.txnLog.commits().filter(_.version > v1)
      .flatMap(_.added).map(rel => s"${lake.root}/$rel").toSet
    val scanned = second.inputFiles.map(f => new java.net.URI(f).getPath).toSet
    assert(scanned === addedByV1)
  }

  test("pure compaction is row-neutral: zero changes across its commit") {
    val lake = seeded()
    // Second file into date=2024-06-16 so the partition is compactable.
    lake.ingestBatch(Seq(bar("MSFT", "2024-06-16 11:30:00")))
    val pre = lake.txnLog.currentVersion()
    lake.compact()
    val post = lake.txnLog.currentVersion()
    assert(post > pre, "compaction should commit")
    assert(lake.changes(pre, post).count() === 0)
  }

  test("DELETE surfaces as delete rows; UPDATE as its delete+insert pair") {
    val lake = seeded()
    val pre = lake.txnLog.currentVersion()
    lake.deleteWhere(org.apache.spark.sql.functions.col("symbol") === "GOOGL")
    val afterDelete = lake.txnLog.currentVersion()

    val dels = lake.changes(pre, afterDelete).collect()
    assert(dels.length === 2)
    assert(dels.forall(_.getAs[String]("_change_type") == "delete"))
    assert(dels.forall(_.getAs[String]("symbol") == "GOOGL"))

    lake.update(
      org.apache.spark.sql.functions.col("symbol") === "AAPL" &&
        org.apache.spark.sql.functions.col("timestamp") === ts("2024-06-15 09:30:00"),
      Map("close" -> org.apache.spark.sql.functions.lit(999.0)))
    val afterUpdate = lake.txnLog.currentVersion()

    val upd = lake.changes(afterDelete, afterUpdate).collect()
    assert(upd.length === 2)
    val byType = upd.groupBy(_.getAs[String]("_change_type"))
    assert(byType("delete").head.getAs[Double]("close") === 153.0)
    assert(byType("insert").head.getAs[Double]("close") === 999.0)
    // Untouched sibling rows in the same rewritten file do NOT appear:
    // the multiset diff cancels them even though their file was rewritten.
    assert(upd.forall(r => r.getAs[Timestamp]("timestamp") == ts("2024-06-15 09:30:00")
      && r.getAs[String]("symbol") == "AAPL"))
  }

  test("remove-then-re-add (DELETE + RESTORE) in one range nets as inserts, not zero") {
    // cancellation must be MULTISET: a file removed once and re-added
    // once (add=1 at seed, remove=1 at delete, add=1 at restore) has
    // net +1 occurrence — set-based cancellation would report zero
    // changes for rows that are live at the range end and absent at
    // the start
    val lake = seeded()
    val preDelete = lake.txnLog.currentVersion()
    lake.deleteWhere(org.apache.spark.sql.functions.col("symbol") === "GOOGL")
    lake.restore(preDelete)
    val afterRestore = lake.txnLog.currentVersion()
    // across delete+restore only: row-neutral (back to the snapshot)
    assert(lake.changes(preDelete, afterRestore).count() === 0)
    // from BEFORE the seed: the GOOGL rows are net inserts and survive
    val all = lake.changes(-1L, afterRestore).collect()
    assert(all.length === 5)
    assert(all.forall(_.getAs[String]("_change_type") == "insert"))
    assert(all.count(_.getAs[String]("symbol") == "GOOGL") === 2)
  }
}
