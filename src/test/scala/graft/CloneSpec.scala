package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.sources.DataLakehouse

/** SHALLOW CLONE (Delta `CREATE TABLE ... SHALLOW CLONE` analog). Pins
  * the contracts that make a clone a zero-copy BRANCH rather than a
  * copy or a view:
  *
  *  1. zero data copy — every cloned file shares the source file's
  *     inode (hard link), no data bytes are written;
  *  2. state equivalence — clone reads (rows, schema) equal the source
  *     snapshot, including historical-version clones;
  *  3. carried metadata — pruning/scan accounting work on the clone
  *     from its v0 commit alone (no footer IO re-derivation);
  *  4. independence — writes and row ops on either side never move the
  *     other side's snapshot, and a source-side vacuum after a
  *     source-side rewrite cannot break the clone (the clone's link
  *     keeps the inode alive).
  */
class CloneSpec extends SparkSpec {

  private def bar(sym: String, t: String, close: Double = 153.0): OhlcvBar =
    OhlcvBar(symbol = sym, timestamp = Timestamp.valueOf(t),
      open = 150.0, high = 155.0, low = 149.0, close = close,
      volume = 1000L, asset_class = AssetClass.Equity)

  private def inode(path: String): Any =
    Files.getAttribute(Paths.get(path), "unix:ino")

  test("clone is zero-copy: every file hard-links the source inode") {
    val srcRoot = tempDir("clone-src")
    val lake = new DataLakehouse(spark, srcRoot)
    lake.ingestBatch(Seq(
      bar("AAPL", "2024-06-15 09:30:00"), bar("GOOG", "2024-06-16 09:30:00")))
    val tgtRoot = tempDir("clone-tgt") + "/t"
    val clone = lake.cloneTo(tgtRoot)
    val files = clone.txnLog.snapshotFiles()
    assert(files.nonEmpty && files == lake.txnLog.snapshotFiles())
    files.foreach { rel =>
      assert(inode(s"$srcRoot/$rel") == inode(s"$tgtRoot/$rel"),
        s"$rel is a copy, not a link")
    }
    // state equivalence
    val a = lake.query().df.select("symbol", "timestamp").collect().toSet
    val b = clone.query().df.select("symbol", "timestamp").collect().toSet
    assert(a == b)
    // carried metadata: scan accounting works with zero footer IO
    assert(clone.query().totalRowsScanned == 2)
    // clone refuses a non-empty target
    intercept[IllegalArgumentException] { lake.cloneTo(tgtRoot) }
  }

  test("historical-version clone equals the source at that version") {
    val lake = new DataLakehouse(spark, tempDir("clone-hist"))
    lake.ingestBatch(Seq(bar("AAPL", "2024-06-15 09:30:00")))
    val v1 = lake.txnLog.currentVersion()
    lake.ingestBatch(Seq(bar("MSFT", "2024-06-16 09:30:00")))
    val clone = lake.cloneTo(tempDir("clone-hist-tgt") + "/t", version = v1)
    assert(clone.query().df.select("symbol").collect()
      .map(_.getString(0)).toSet == Set("AAPL"))
    // the clone starts its OWN history at v0
    assert(clone.txnLog.currentVersion() == 0L)
  }

  test("clone and source are independent branches; source vacuum cannot break the clone") {
    val lake = new DataLakehouse(spark, tempDir("clone-ind"))
    lake.ingestBatch(Seq(
      bar("AAPL", "2024-06-15 09:30:00"), bar("GOOG", "2024-06-15 09:30:00")))
    val clone = lake.cloneTo(tempDir("clone-ind-tgt") + "/t")

    // diverge both sides
    clone.ingestBatch(Seq(bar("MSFT", "2024-06-16 09:30:00")))
    assert(lake.deleteWhere(col("symbol") === "GOOG") == 1)

    def syms(l: DataLakehouse) =
      l.query().df.select("symbol").collect().map(_.getString(0)).toSet
    assert(syms(lake) == Set("AAPL"))
    assert(syms(clone) == Set("AAPL", "GOOG", "MSFT"))

    // source-side rewrite made the original shared file DEAD in the
    // source; vacuum unlinks it there — the clone's hard link must keep
    // the inode (and the clone's reads) alive
    assert(lake.vacuum(retainMs = 0L) > 0)
    assert(syms(clone) == Set("AAPL", "GOOG", "MSFT"))
    // and the clone's own integrity audit stays clean
    assert(clone.verifyIntegrity().filter(col("status") =!= "ok").count() == 0)
  }

  test("cloning a vacuumed historical version fails loudly") {
    val lake = new DataLakehouse(spark, tempDir("clone-vac"))
    lake.ingestBatch(Seq(bar("AAPL", "2024-06-15 09:30:00")))
    val v1 = lake.txnLog.currentVersion()
    lake.ingestBatch(Seq(bar("AAPL", "2024-06-15 10:30:00")))
    lake.compact(maxFilesPerPartition = 1)
    assert(lake.vacuum(retainMs = 0L) > 0)
    val e = intercept[RuntimeException] {
      lake.cloneTo(tempDir("clone-vac-tgt") + "/t", version = v1)
    }
    assert(e.getMessage.contains("missing"))
  }
}
