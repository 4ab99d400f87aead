package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.sources.DataLakehouse

/** Copy-on-write row operations (DELETE / UPDATE / MERGE) — the mutable-
  * lakehouse surface the reference declares (README.md:25,43) but leaves
  * append-only. Pins the three contracts that matter at scale:
  *
  *  1. minimal rewrite — files without an affected row survive UNTOUCHED
  *     (same relative path in the next snapshot, no data churn);
  *  2. single-commit atomicity — every row op is exactly one txn version,
  *     so time travel to the pre-op snapshot still sees the old rows;
  *  3. serializable conflict detection — a commit that would remove a
  *     file already removed by a concurrent writer fails loudly instead
  *     of resurrecting deleted rows.
  */
class RowOpsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def bar(sym: String, t: String, close: Double = 153.0): OhlcvBar =
    OhlcvBar(symbol = sym, timestamp = ts(t),
      open = 150.0, high = 155.0, low = 149.0, close = close,
      volume = 1000L, asset_class = AssetClass.Equity)

  /** Two partitions (June 15/16), two symbols, 8 rows. Written as TWO
    * commits so the table holds several files and minimal-rewrite is
    * observable.
    */
  private def seeded(): DataLakehouse = {
    val lake = new DataLakehouse(spark, tempDir("rowops"))
    lake.ingestBatch(Seq(
      bar("AAPL", "2024-06-15 09:30:00"), bar("AAPL", "2024-06-15 10:30:00"),
      bar("GOOGL", "2024-06-15 09:30:00"), bar("GOOGL", "2024-06-15 10:30:00")))
    lake.ingestBatch(Seq(
      bar("AAPL", "2024-06-16 09:30:00"), bar("AAPL", "2024-06-16 10:30:00"),
      bar("GOOGL", "2024-06-16 09:30:00"), bar("GOOGL", "2024-06-16 10:30:00")))
    lake
  }

  test("deleteWhere removes matching rows only and keeps other files untouched") {
    val lake = seeded()
    val before = lake.txnLog.snapshotFiles()
    val preVersion = lake.txnLog.currentVersion()

    val deleted = lake.deleteWhere(
      col("symbol") === "AAPL" && col("date") === "2024-06-15")
    assert(deleted == 2)

    val rows = lake.query().df.select("symbol", "date").collect()
    assert(rows.length == 6)
    assert(!rows.exists(r => r.getString(0) == "AAPL" && r.getString(1) == "2024-06-15"))

    // minimal rewrite: the June-16 file(s) and June-15's untouched rows'
    // *other* files must still be the SAME paths, not rewrites
    val after = lake.txnLog.snapshotFiles().toSet
    val june16Before = before.filter(_.contains("date=2024-06-16"))
    assert(june16Before.nonEmpty && june16Before.forall(after.contains))

    // single-commit atomicity: exactly one new version; time travel to
    // the pre-delete snapshot still sees all 8 rows
    assert(lake.txnLog.currentVersion() == preVersion + 1)
    assert(lake.timeTravel(preVersion).count() == 8)
  }

  test("deleteWhere: NULL condition keeps the row (three-valued semantics)") {
    val lake = seeded()
    // close/lit arithmetic that is NULL for June-16 rows via a when with
    // no otherwise: NULL must behave as KEEP, not delete
    val cond = when(col("date") === "2024-06-15", col("symbol") === "AAPL")
    val deleted = lake.deleteWhere(cond)
    assert(deleted == 2) // only June-15 AAPL, never the NULL-condition rows
    assert(lake.query().df.count() == 6)
  }

  test("deleteWhere with no matches is a no-op commit-wise") {
    val lake = seeded()
    val v = lake.txnLog.currentVersion()
    assert(lake.deleteWhere(col("symbol") === "TSLA") == 0)
    assert(lake.txnLog.currentVersion() == v) // no empty commit
  }

  test("deleteRange prunes candidates by partition + log stats before scanning") {
    val lake = seeded()
    val deleted = lake.deleteRange(symbol = Some("GOOGL"),
      start = Some(ts("2024-06-16 00:00:00")))
    assert(deleted == 2)
    val left = lake.query().df.select("symbol", "date").collect()
    assert(left.count(r => r.getString(0) == "GOOGL") == 2) // June 15 kept
  }

  test("update rewrites matched rows; expressions see the OLD row") {
    val lake = seeded()
    // swap open/close on AAPL rows — only correct if both SET expressions
    // evaluate against the pre-update row
    val updated = lake.update(col("symbol") === "AAPL",
      Map("open" -> col("close"), "close" -> col("open")))
    assert(updated == 4)
    val aapl = lake.query(symbol = Some("AAPL")).df
      .select("open", "close").collect()
    assert(aapl.forall(r => r.getDouble(0) == 153.0 && r.getDouble(1) == 150.0))
    // untouched symbol unchanged
    val googl = lake.query(symbol = Some("GOOGL")).df
      .select("open", "close").collect()
    assert(googl.forall(r => r.getDouble(0) == 150.0 && r.getDouble(1) == 153.0))
  }

  test("update moving timestamp across a day boundary migrates the partition") {
    val lake = seeded()
    val updated = lake.update(
      col("symbol") === "AAPL" && col("date") === "2024-06-15",
      Map("timestamp" -> (col("timestamp") + expr("INTERVAL 2 DAYS"))))
    assert(updated == 2)
    val parts = lake.listPartitions()
    assert(parts.contains("2024-06-17")) // new partition exists
    val moved = lake.query(symbol = Some("AAPL")).df
      .select("date").collect().map(_.getString(0)).toSet
    assert(moved == Set("2024-06-16", "2024-06-17"))
  }

  test("update rejects SET on partition columns and unknown columns") {
    val lake = seeded()
    intercept[IllegalArgumentException] {
      lake.update(lit(true), Map("date" -> lit("2024-01-01")))
    }
    intercept[IllegalArgumentException] {
      lake.update(lit(true), Map("nope" -> lit(1)))
    }
  }

  test("merge replaces matched rows, inserts the rest, in one commit") {
    val lake = seeded()
    import spark.implicits._
    val preVersion = lake.txnLog.currentVersion()
    val src = Seq(
      bar("AAPL", "2024-06-15 09:30:00", close = 999.0), // replaces
      bar("TSLA", "2024-06-15 09:30:00", close = 111.0)) // inserts
      .toDF()
    val (replaced, inserted) = lake.merge(src, Seq("symbol", "timestamp"))
    assert(replaced == 1 && inserted == 1)
    assert(lake.txnLog.currentVersion() == preVersion + 1)

    val df = lake.query().df
    assert(df.count() == 9)
    val hit = df.filter(col("symbol") === "AAPL" &&
      col("timestamp") === ts("2024-06-15 09:30:00")).select("close").collect()
    assert(hit.map(_.getDouble(0)).toSeq == Seq(999.0)) // replaced, not duplicated
    assert(df.filter(col("symbol") === "TSLA").count() == 1)

    // minimal rewrite: June-16 files untouched
    val after = lake.txnLog.snapshotFiles().toSet
    assert(lake.timeTravel(preVersion).count() == 8)
    assert(after.exists(_.contains("date=2024-06-16")))
  }

  test("merge into an empty table is a pure insert") {
    val lake = new DataLakehouse(spark, tempDir("rowops-empty"))
    import spark.implicits._
    val (replaced, inserted) =
      lake.merge(Seq(bar("AAPL", "2024-06-15 09:30:00")).toDF(),
        Seq("symbol", "timestamp"))
    assert(replaced == 0 && inserted == 1)
    assert(lake.query().df.count() == 1)
  }

  test("merge rejects a source with duplicate keys") {
    val lake = seeded()
    import spark.implicits._
    val dup = Seq(bar("AAPL", "2024-06-15 09:30:00", 1.0),
      bar("AAPL", "2024-06-15 09:30:00", 2.0)).toDF()
    intercept[IllegalArgumentException] {
      lake.merge(dup, Seq("symbol", "timestamp"))
    }
  }

  test("conflicting concurrent row-ops: second commit fails, rows are not resurrected") {
    val lake = seeded()
    // writer B plans a rewrite of the same files writer A then removes
    val staleTargets = lake.txnLog.snapshotFiles()
      .filter(_.contains("date=2024-06-15"))
    assert(staleTargets.nonEmpty)
    lake.deleteWhere(col("date") === "2024-06-15") // writer A wins
    intercept[java.util.ConcurrentModificationException] {
      lake.txnLog.commit(added = Nil, removed = staleTargets,
        requireLive = staleTargets) // writer B's stale swap must fail
    }
  }

  test("compaction racing a DELETE cannot resurrect the deleted rows") {
    // The lost-delete race: compaction reads its input snapshot, a
    // concurrent DELETE rewrites one of those files, compaction commits
    // the rewrite of the OLD content — without conflict detection the
    // deleted rows come back (and the delete's output file duplicates
    // the survivors). The compactImpl seam interleaves the delete into
    // the exact snapshot-read -> commit window.
    val lake = seeded()
    val before = lake.query().count
    intercept[java.util.ConcurrentModificationException] {
      lake.compactImpl(maxFilesPerPartition = 0, targetFiles = 2, () =>
        assert(lake.deleteWhere(col("symbol") === "AAPL") > 0))
    }
    // the delete's effect stands; nothing resurrected, nothing duplicated
    assert(lake.query().df.filter(col("symbol") === "AAPL").count() == 0)
    assert(lake.query().count < before)
    // and a RE-RUN compaction against the post-delete snapshot succeeds
    assert(lake.compactImpl(0, 2, () => ()) >= 0)
    assert(lake.query().df.filter(col("symbol") === "AAPL").count() == 0)
  }

  test("null-keyed source rows are never ambiguous: they always insert") {
    val lake = seeded()
    import spark.implicits._
    // two rows whose merge key is NULL: SQL equality matches nothing, so
    // neither can REPLACE a target row — the uniqueness precheck (which
    // guards replace ambiguity only) must not reject them under its
    // null-safe grouping; per the contract they both insert
    val src = Seq(bar("X", "2024-06-15 09:30:00", 1.0),
      bar("X", "2024-06-15 09:30:00", 2.0)).toDF()
      .withColumn("symbol", lit(null).cast("string"))
    val before = lake.query().count
    val (replaced, inserted) = lake.merge(src, Seq("symbol", "timestamp"))
    assert(replaced == 0 && inserted == 2)
    assert(lake.query().df.filter(col("symbol").isNull).count() == 2)
    assert(lake.query().count == before + 2)
  }
}
