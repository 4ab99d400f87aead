package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.sources.DataLakehouse

/** RESTORE TO VERSION AS OF (Delta RESTORE parity). Pins the contracts
  * that distinguish a restore from a blind re-append:
  *
  *  1. state equivalence — post-restore reads (rows AND schema) equal the
  *     target snapshot exactly;
  *  2. metadata-only — no data file is written, moved, or rewritten; the
  *     restore commit re-references the historical files and carries
  *     their historical row counts (so `rowsScanned` accounting and
  *     file pruning keep working without footer IO);
  *  3. history preserved — the pre-restore snapshot is still
  *     time-travelable, and the restore itself can be restored away;
  *  4. vacuum safety — a target whose files were vacuumed fails loudly
  *     BEFORE any commit is written.
  */
class RestoreSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def bar(sym: String, t: String, close: Double = 153.0): OhlcvBar =
    OhlcvBar(symbol = sym, timestamp = ts(t),
      open = 150.0, high = 155.0, low = 149.0, close = close,
      volume = 1000L, asset_class = AssetClass.Equity)

  private def dataFiles(root: String): Set[String] = {
    val rootPath = Paths.get(root)
    val s = Files.walk(rootPath)
    try s.iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .map(p => rootPath.relativize(p).toString)
      .filterNot(r => r.startsWith("_staging") || r.startsWith("_dlq"))
      .toSet
    finally s.close()
  }

  test("restore rewinds rows to the target snapshot without touching data files") {
    val root = tempDir("restore")
    val lake = new DataLakehouse(spark, root)
    lake.ingestBatch(Seq(
      bar("AAPL", "2024-06-15 09:30:00"), bar("GOOGL", "2024-06-15 09:30:00")))
    val v1 = lake.txnLog.currentVersion()
    lake.ingestBatch(Seq(bar("AAPL", "2024-06-16 09:30:00")))
    val deleted = lake.deleteWhere(col("symbol") === "GOOGL")
    assert(deleted == 1)
    assert(lake.query().df.count() == 2)

    val filesBefore = dataFiles(root)
    val v = lake.restore(v1)
    assert(v == lake.txnLog.currentVersion())

    // state equivalence with snapshot(v1)
    val now = lake.query().df.select("symbol", "timestamp").collect()
      .map(r => (r.getString(0), r.getTimestamp(1))).toSet
    val then_ = lake.query(asOfVersion = Some(v1)).df
      .select("symbol", "timestamp").collect()
      .map(r => (r.getString(0), r.getTimestamp(1))).toSet
    assert(now == then_)
    assert(now.map(_._1) == Set("AAPL", "GOOGL"))

    // metadata-only: the restore wrote ZERO new data files
    assert(dataFiles(root) == filesBefore)

    // historical row counts carried: scan accounting for a full read
    // matches actual rows without footer IO
    assert(lake.query().totalRowsScanned == 2)
  }

  test("restore preserves history: pre-restore snapshot stays travelable and restorable") {
    val lake = new DataLakehouse(spark, tempDir("restore-hist"))
    lake.ingestBatch(Seq(bar("AAPL", "2024-06-15 09:30:00")))
    val v1 = lake.txnLog.currentVersion()
    lake.ingestBatch(Seq(bar("MSFT", "2024-06-16 09:30:00")))
    val v2 = lake.txnLog.currentVersion()

    lake.restore(v1)
    assert(lake.query().df.count() == 1)
    // the richer pre-restore snapshot is still there
    assert(lake.query(asOfVersion = Some(v2)).df.count() == 2)
    // and restoring "forward" to it undoes the restore
    lake.restore(v2)
    assert(lake.query().df.count() == 2)
    // idempotence: restoring to the state we're already at is a no-op
    assert(lake.restore(v2) == -1L)
  }

  test("restore rewinds schema evolution") {
    val lake = new DataLakehouse(spark, tempDir("restore-schema"))
    lake.ingestBatch(Seq(bar("AAPL", "2024-06-15 09:30:00")))
    val v1 = lake.txnLog.currentVersion()
    // evolve: append a frame with an extra column
    val evolved = lake.query().df.withColumn("venue", lit("XNAS"))
      .withColumn("symbol", lit("MSFT")).drop("date")
    lake.appendDF(evolved)
    assert(lake.query().df.columns.contains("venue"))

    lake.restore(v1)
    assert(!lake.query().df.columns.contains("venue"))
    assert(lake.query().df.count() == 1)
  }

  test("history labels restore commits with an explicit operation tag") {
    // ADVICE r5: delta-inferred ops cannot distinguish a restore from a
    // generic rewrite — the audit question "what rewound this table?"
    // needs the explicit tag
    val lake = new DataLakehouse(spark, tempDir("restore-op"))
    lake.ingestBatch(Seq(bar("AAPL", "2024-06-15 09:30:00")))
    val v1 = lake.txnLog.currentVersion()
    lake.ingestBatch(Seq(bar("MSFT", "2024-06-16 09:30:00")))
    val v = lake.restore(v1)
    val ops = lake.history().select("version", "operation").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ops(v) == "restore")
    assert(ops.values.count(_ == "restore") == 1) // appends keep their label
  }

  test("post-commit TOCTOU verification compensates a vacuumed re-add loudly") {
    // ADVICE r5 TOCTOU: a vacuum can win the window between restore's
    // pre-commit existence check and its commit. The guard is the
    // post-commit verification — drive it directly with a re-added file
    // that vanished after "commit": it must write a compensating commit
    // removing the casualty and throw, leaving every file of the final
    // live set present on disk.
    val root = tempDir("restore-toctou")
    val lake = new DataLakehouse(spark, root)
    lake.ingestBatch(Seq(bar("AAPL", "2024-06-15 09:30:00")))
    val v1 = lake.txnLog.currentVersion()
    lake.ingestBatch(Seq(bar("AAPL", "2024-06-15 10:30:00")))
    lake.compact(maxFilesPerPartition = 1)
    lake.restore(v1) // live set = v1's file, as a real restore would leave it
    val reAdded = lake.txnLog.snapshotFiles()
    Files.delete(Paths.get(root, reAdded.head)) // the "vacuum" wins the race
    val verBefore = lake.txnLog.currentVersion()
    val e = intercept[RuntimeException] {
      lake.postRestoreVerify(v1, verBefore, reAdded)
    }
    assert(e.getMessage.contains("vacuumed concurrently"))
    // exactly one compensating commit, tagged, removing the casualty
    val comp = lake.history().select("version", "operation", "files_removed")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(comp.count(_._2 == "restore-failed") == 1)
    assert(comp.find(_._1 == verBefore + 1).exists(c =>
      c._2 == "restore-failed" && c._3 == 1))
    // the table never stays on a snapshot referencing missing files
    val live = lake.txnLog.snapshotFiles()
    assert(live.forall(r => Files.isRegularFile(Paths.get(root, r))))
  }

  test("restore to a vacuumed snapshot fails loudly before committing") {
    val lake = new DataLakehouse(spark, tempDir("restore-vacuum"))
    lake.ingestBatch(Seq(bar("AAPL", "2024-06-15 09:30:00")))
    val v1 = lake.txnLog.currentVersion()
    // compact rewrites the partition; vacuum then deletes v1's file
    lake.ingestBatch(Seq(bar("AAPL", "2024-06-15 10:30:00")))
    lake.compact(maxFilesPerPartition = 1)
    assert(lake.vacuum(retainMs = 0L) > 0)
    val verBefore = lake.txnLog.currentVersion()
    val e = intercept[RuntimeException] { lake.restore(v1) }
    assert(e.getMessage.contains("vacuumed"))
    // no partial commit was written; live state untouched
    assert(lake.txnLog.currentVersion() == verBefore)
    assert(lake.query().df.count() == 2)
  }
}
