package graft

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.sql.Timestamp

import graft.sources.DataLakehouse

/** FSCK-style snapshot audit (`DataLakehouse.verifyIntegrity`): the log's
  * commit-time record vs what is actually on disk. Each corruption mode a
  * real object store exhibits — vanished object, truncated object,
  * silently replaced object — must be detected from footer IO alone.
  */
class IntegritySpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def bar(i: Int): OhlcvBar = OhlcvBar(
    symbol = if (i % 2 == 0) "AAPL" else "GOOGL",
    timestamp = new Timestamp(ts("2024-06-15 09:30:00").getTime + i * 60000L),
    open = 150.0 + i, high = 155.0 + i, low = 149.0 + i, close = 153.0 + i,
    volume = 1000000L + 1000L * i, asset_class = AssetClass.Equity)

  private def newLake(): DataLakehouse = {
    val lake = new DataLakehouse(spark, tempDir("fsck"), batchSize = 100)
    lake.ingestBatch((0 until 20).map(bar))
    lake
  }

  private def liveFiles(lake: DataLakehouse): Seq[String] =
    lake.txnLog.snapshotFiles()

  test("history reflects appends, rewrites, and row deltas per version") {
    val lake = newLake()                       // v0: append 20 rows
    lake.ingestBatch((20 until 30).map(bar))   // v1: append 10 rows
    lake.compact()                             // v2: rewrite
    val h = lake.history().collect()
    assert(h.map(_.getAs[Long]("version")).toSeq == Seq(2L, 1L, 0L))
    val byV = h.map(r => r.getAs[Long]("version") -> r).toMap
    assert(byV(0L).getAs[String]("operation") == "append")
    assert(byV(0L).getAs[Long]("rows_added") == 20L)
    assert(byV(1L).getAs[String]("operation") == "append")
    assert(byV(1L).getAs[Long]("rows_added") == 10L)
    assert(byV(2L).getAs[String]("operation") == "rewrite")
    assert(byV(2L).getAs[Long]("files_removed") > 0L)
    assert(byV(2L).getAs[Long]("rows_added") == 30L) // rewrite carries all rows
  }

  test("clean table verifies ok on every file") {
    val lake = newLake()
    val report = lake.verifyIntegrity().collect()
    assert(report.nonEmpty)
    assert(report.forall(_.getAs[String]("status") == "ok"))
    // expected == actual rows everywhere, and totals match what we ingested
    assert(report.map(_.getAs[Long]("actual_rows")).sum == 20L)
    assert(report.forall(r =>
      r.getAs[Long]("expected_rows") == r.getAs[Long]("actual_rows")))
  }

  test("vanished file reported missing; others stay ok") {
    val lake = newLake()
    val victim = liveFiles(lake).head
    Files.delete(Paths.get(lake.root, victim))
    val byFile = lake.verifyIntegrity().collect()
      .map(r => r.getAs[String]("file") -> r.getAs[String]("status")).toMap
    assert(byFile(victim) == "missing")
    assert(byFile.collect { case (f, s) if f != victim => s }.forall(_ == "ok"))
  }

  test("truncated file reported unreadable (parquet footer destroyed)") {
    val lake = newLake()
    val victim = liveFiles(lake).head
    val p = Paths.get(lake.root, victim)
    val bytes = Files.readAllBytes(p)
    Files.write(p, bytes.take(bytes.length / 2),
      StandardOpenOption.TRUNCATE_EXISTING)
    val status = lake.verifyIntegrity().collect()
      .find(_.getAs[String]("file") == victim).get.getAs[String]("status")
    assert(status == "unreadable")
  }

  test("silently replaced file reported as row-count mismatch") {
    val lake = newLake()
    val other = new DataLakehouse(spark, tempDir("fsck-other"), batchSize = 100)
    other.ingestBatch((0 until 5).map(bar)) // fewer rows, valid parquet
    val victim = liveFiles(lake).find(_.endsWith(".parquet")).get
    val donor = liveFiles(other).find(_.endsWith(".parquet")).get
    Files.copy(Paths.get(other.root, donor), Paths.get(lake.root, victim),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val status = lake.verifyIntegrity().collect()
      .find(_.getAs[String]("file") == victim).get.getAs[String]("status")
    assert(status == "row_count_mismatch")
  }

  test("same-count replacement with shifted data reported as stats mismatch") {
    val lake = newLake()
    // donor: same row COUNT as one live file but a different time range,
    // so only the (symbol, ts) bounds can tell them apart
    val victim = liveFiles(lake).find(_.endsWith(".parquet")).get
    val victimRows = lake.verifyIntegrity().collect()
      .find(_.getAs[String]("file") == victim).get.getAs[Long]("actual_rows")
    val other = new DataLakehouse(spark, tempDir("fsck-shift"), batchSize = 100)
    other.ingestBatch((0 until victimRows.toInt).map(i =>
      bar(i).copy(timestamp =
        new Timestamp(ts("2024-06-16 09:30:00").getTime + i * 60000L))))
    val donor = liveFiles(other).find(_.endsWith(".parquet")).get
    Files.copy(Paths.get(other.root, donor), Paths.get(lake.root, victim),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val status = lake.verifyIntegrity().collect()
      .find(_.getAs[String]("file") == victim).get.getAs[String]("status")
    assert(status == "stats_mismatch")
  }
}
