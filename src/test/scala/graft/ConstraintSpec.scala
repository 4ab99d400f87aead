package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.sources.{DataLakehouse, TxnLog}

/** Table CHECK constraints (Delta `ALTER TABLE ADD CONSTRAINT` parity):
  * log-persisted, enforced atomically on every write path, carried by
  * clone, rewound by restore.
  */
class ConstraintSpec extends SparkSpec {

  private def bar(sym: String, t: String, close: Double = 153.0,
      volume: Long = 1000L): OhlcvBar =
    OhlcvBar(symbol = sym, timestamp = Timestamp.valueOf(t),
      open = 150.0, high = math.max(155.0, close), low = 149.0,
      close = close, volume = volume, asset_class = AssetClass.Equity)

  test("add/enforce/drop lifecycle; violating append fails atomically") {
    val lake = new DataLakehouse(spark, tempDir("constr"))
    lake.ingestBatch(Seq(bar("AAPL", "2024-06-15 09:30:00")))
    lake.addConstraint("positive_close", "close > 0")
    lake.addConstraint("sane_volume", "volume < 1000000")
    assert(lake.constraints.keySet == Set("positive_close", "sane_volume"))

    // valid append passes
    lake.appendDF(lake.query().df.drop("date")
      .withColumn("symbol", lit("GOOG")))
    assert(lake.query().df.count() == 2)

    // violating append fails BEFORE anything is staged or committed
    val verBefore = lake.txnLog.currentVersion()
    val badDf = lake.query().df.drop("date")
      .withColumn("symbol", lit("BAD")).withColumn("close", lit(-5.0))
    val e = intercept[IllegalStateException] { lake.appendDF(badDf) }
    assert(e.getMessage.contains("positive_close"))
    assert(lake.txnLog.currentVersion() == verBefore) // no partial commit
    assert(lake.query().df.count() == 2)

    // NULL passes (SQL CHECK semantics)
    lake.appendDF(lake.query().df.drop("date").limit(1)
      .withColumn("symbol", lit("NULLC"))
      .withColumn("close", lit(null).cast("double")))
    assert(lake.query().df.count() == 3)

    // drop re-opens the gate (badDf carries the 2-row snapshot it was
    // built from, so the table grows 3 -> 5)
    lake.dropConstraint("positive_close")
    assert(lake.constraints.keySet == Set("sane_volume"))
    lake.appendDF(badDf)
    assert(lake.query().df.count() == 5)
    intercept[IllegalArgumentException] { lake.dropConstraint("positive_close") }
  }

  test("addConstraint validates existing rows and rejects unresolvable expressions") {
    val lake = new DataLakehouse(spark, tempDir("constr-val"))
    // a NEGATIVE-close bar that still satisfies the P5 ingest invariants
    // (close within [low, high]) — barValid has no positivity rule, so
    // this lands in the table and must block the constraint
    lake.ingestBatch(Seq(OhlcvBar("AAPL",
      Timestamp.valueOf("2024-06-15 09:30:00"),
      open = -2.0, high = 0.0, low = -5.0, close = -1.0,
      volume = 1000L, asset_class = AssetClass.Equity)))
    assert(lake.query().df.count() == 1)
    // existing violation -> refused, nothing recorded
    val e = intercept[IllegalStateException] {
      lake.addConstraint("positive_close", "close > 0")
    }
    assert(e.getMessage.contains("1 existing row"))
    assert(lake.constraints.isEmpty)
    // a typo'd column must fail AT ADD TIME, not on the next append
    intercept[Exception] { lake.addConstraint("typo", "no_such_col > 0") }
    assert(lake.constraints.isEmpty)
  }

  test("constraints enforce on UPDATE and MERGE write paths") {
    val lake = new DataLakehouse(spark, tempDir("constr-rowops"))
    lake.ingestBatch(Seq(bar("AAPL", "2024-06-15 09:30:00")))
    lake.addConstraint("positive_close", "close > 0")
    intercept[IllegalStateException] {
      lake.update(col("symbol") === "AAPL", Map("close" -> lit(-9.0)))
    }
    assert(lake.query().df.select("close").collect().head.getDouble(0) == 153.0)
    intercept[IllegalStateException] {
      lake.merge(
        spark.createDataset(Seq(bar("MSFT", "2024-06-16 09:30:00")))(
          org.apache.spark.sql.Encoders.product[OhlcvBar])
          .toDF().withColumn("close", lit(-2.0)),
        Seq("symbol", "timestamp"))
    }
    assert(lake.query().df.count() == 1)
  }

  test("constraints persist across instances and survive checkpoints") {
    val root = tempDir("constr-persist")
    val lake = new DataLakehouse(spark, root)
    lake.ingestBatch(Seq(bar("AAPL", "2024-06-15 09:30:00")))
    lake.addConstraint("positive_close", "close > 0")
    // push past a checkpoint boundary (interval 10) with appends
    (0 until 12).foreach { i =>
      lake.appendDF(lake.query().df.drop("date").limit(1)
        .withColumn("symbol", lit(s"S$i")))
    }
    // a COLD instance resolves constraints from checkpoint + tail
    val cold = new DataLakehouse(spark, root)
    assert(cold.constraints == Map("positive_close" -> "close > 0"))
    intercept[IllegalStateException] {
      cold.appendDF(cold.query().df.drop("date").limit(1)
        .withColumn("close", lit(-1.0)))
    }
  }

  test("SQL surface: ALTER TABLE ADD/DROP CONSTRAINT through lake.sql") {
    val lake = new DataLakehouse(spark, tempDir("constr-sql"))
    lake.ingestBatch(Seq(bar("AAPL", "2024-06-15 09:30:00")))
    lake.sql("ALTER TABLE trades ADD CONSTRAINT positive_close CHECK (close > 0)")
    assert(lake.constraints == Map("positive_close" -> "close > 0"))
    // parenthesized predicate survives the greedy capture
    lake.sql(
      "ALTER TABLE trades ADD CONSTRAINT sane CHECK ((volume >= 0) AND (high >= low))")
    assert(lake.constraints("sane") == "(volume >= 0) AND (high >= low)")
    intercept[IllegalStateException] {
      lake.appendDF(lake.query().df.drop("date").withColumn("close", lit(-1.0)))
    }
    lake.sql("ALTER TABLE trades DROP CONSTRAINT positive_close")
    assert(lake.constraints.keySet == Set("sane"))
    // non-DDL statements still reach Spark SQL unchanged
    assert(lake.sql("SELECT count(*) AS n FROM trades").collect()(0).getLong(0) == 1L)
  }

  test("racing constraint DDL is loud, never last-writer-wins") {
    // two writers race ALTER TABLE: both read the same base map; the
    // loser's commit must throw (predecessor constraint state no longer
    // matches what it validated) instead of silently dropping the
    // winner's constraint. Driven at the TxnLog primitive: the stale
    // expectedConstraints IS addConstraint's read-modify-write window.
    val root = tempDir("constr-race")
    val lake = new DataLakehouse(spark, root)
    lake.ingestBatch(Seq(bar("AAPL", "2024-06-15 09:30:00")))
    val stale = lake.txnLog.constraintsAt() // both writers read this
    lake.addConstraint("positive_close", "close > 0") // writer 1 wins
    intercept[java.util.ConcurrentModificationException] {
      lake.txnLog.commit(added = Nil, op = Some("add-constraint"),
        constraintsJson = Some(TxnLog.encodeConstraints(
          Map("sane_volume" -> "volume < 1000000"))),
        expectedConstraints = Some(stale)) // writer 2, stale base
    }
    // the winner's constraint survived
    assert(lake.constraints == Map("positive_close" -> "close > 0"))
  }

  test("constraint added concurrently with a data write: violating batch fails, conforming batch retries and commits") {
    // The data-path TOCTOU (ADVICE r7): appendDF validates against the
    // constraint map it READ, but a constraint added between that read
    // and the commit would otherwise never see the batch (its full-table
    // scan ran before the batch's files were live) — violating rows
    // would slip past BOTH checks. The commit now carries the validation
    // snapshot as expectedConstraints; the conflict re-validates against
    // the new map. Driven through the beforeDataCommit seam — the exact
    // race window.
    val lake = new DataLakehouse(spark, tempDir("constr-toctou"))
    lake.ingestBatch(Seq(bar("AAPL", "2024-06-15 09:30:00")))
    val writer2 = new DataLakehouse(spark, lake.root) // concurrent DDL author

    // case 1: the racing constraint REJECTS the in-flight batch
    lake.beforeDataCommit = () => {
      lake.beforeDataCommit = () => ()
      writer2.addConstraint("positive_close", "close > 0")
    }
    val verBefore = lake.txnLog.currentVersion()
    val badDf = lake.query().df.drop("date")
      .withColumn("symbol", lit("BAD")).withColumn("close", lit(-5.0))
    val e = intercept[IllegalStateException] { lake.appendDF(badDf) }
    assert(e.getMessage.contains("positive_close"))
    // the DDL committed; the data write did NOT
    assert(lake.txnLog.currentVersion() == verBefore + 1)
    assert(lake.query().df.filter(col("symbol") === "BAD").count() == 0)

    // case 2: the racing constraint PASSES the batch -> retried commit
    writer2.dropConstraint("positive_close")
    lake.beforeDataCommit = () => {
      lake.beforeDataCommit = () => ()
      writer2.addConstraint("sane_volume", "volume < 1000000")
    }
    lake.appendDF(lake.query().df.drop("date")
      .withColumn("symbol", lit("GOOG")))
    assert(lake.query().df.filter(col("symbol") === "GOOG").count() == 1)
    assert(lake.constraints.keySet == Set("sane_volume"))
  }

  test("clone carries constraints; restore rewinds them") {
    val lake = new DataLakehouse(spark, tempDir("constr-clone"))
    lake.ingestBatch(Seq(bar("AAPL", "2024-06-15 09:30:00")))
    val vNoConstraints = lake.txnLog.currentVersion()
    lake.addConstraint("positive_close", "close > 0")

    val clone = lake.cloneTo(tempDir("constr-clone-tgt") + "/t")
    assert(clone.constraints == Map("positive_close" -> "close > 0"))
    intercept[IllegalStateException] {
      clone.appendDF(clone.query().df.drop("date").withColumn("close", lit(-1.0)))
    }

    // restore to the pre-constraint version rewinds the map...
    lake.restore(vNoConstraints)
    assert(lake.constraints.isEmpty)
    // ...and restoring forward brings it back
    lake.restore(vNoConstraints + 1)
    assert(lake.constraints == Map("positive_close" -> "close > 0"))
  }

  test("restore racing a pure constraint DDL conflicts instead of clobbering it") {
    // A pure DDL changes no files, so restore's requireLive check alone
    // would let the restore commit silently erase a constraint added in
    // its read->commit window. expectedConstraints makes restore-vs-DDL
    // serializable: the restore loses loudly, and a re-run (now reading
    // the DDL's map) succeeds with ordinary wholesale-rewind semantics.
    val lake = new DataLakehouse(spark, tempDir("constr-restore-race"))
    lake.ingestBatch(Seq(bar("AAPL", "2024-06-15 09:30:00")))
    val v0 = lake.txnLog.currentVersion()
    lake.ingestBatch(Seq(bar("AAPL", "2024-06-15 10:30:00")))
    intercept[TxnLog.ConstraintConflictException] {
      lake.restoreImpl(v0, () =>
        lake.addConstraint("positive_close", "close > 0"))
    }
    // the concurrent DDL's constraint survived the losing restore
    assert(lake.constraints == Map("positive_close" -> "close > 0"))
    // the re-run restore wins and rewinds wholesale, constraint included
    assert(lake.restore(v0) > 0)
    assert(lake.constraints.isEmpty)
    assert(lake.query().count == 1)
  }

  test("a failed flush keeps the buffered bars for retry") {
    val lake = new DataLakehouse(spark, tempDir("constr-flushkeep"))
    lake.addConstraint("sane_volume", "volume < 100")
    // a structurally-valid bar that violates the CHECK at flush time
    assert(lake.ingest(bar("AAPL", "2024-06-15 09:30:00", volume = 5000L)))
    val e = intercept[IllegalStateException] { lake.flush() }
    assert(e.getMessage.contains("sane_volume"))
    // the accepted bar SURVIVES the failed flush: clear-before-append
    // silently discarded it (not committed, not buffered, not DLQ'd)
    assert(lake.bufferedCount == 1)
    lake.dropConstraint("sane_volume")
    assert(lake.flush() > 0)
    assert(lake.bufferedCount == 0)
    assert(lake.query().df.count() == 1)
  }

  test("addFiles enforces CHECK constraints on registered external files") {
    val lake = new DataLakehouse(spark, tempDir("constr-addfiles"))
    lake.ingestBatch(Seq(bar("AAPL", "2024-06-15 09:30:00")))
    lake.addConstraint("sane_volume", "volume < 1000000")
    // an external parquet violating the CHECK, written under a partition
    // dir by an outside producer (no lake write path involved)
    val extDir = s"${lake.root}/date=2024-06-16"
    lake.query().df.drop("date")
      .withColumn("timestamp",
        lit(Timestamp.valueOf("2024-06-16 09:30:00")))
      .withColumn("volume", lit(99999999L))
      .coalesce(1).write.mode("append").parquet(extDir)
    val rel = new java.io.File(extDir).listFiles()
      .map(_.getName).find(_.endsWith(".parquet"))
      .map(f => s"date=2024-06-16/$f").get
    val before = lake.txnLog.currentVersion()
    val e = intercept[IllegalStateException] { lake.addFiles(Seq(rel)) }
    assert(e.getMessage.contains("sane_volume"))
    // registration rejected ATOMICALLY: no commit, table reads clean
    assert(lake.txnLog.currentVersion() == before)
    assert(lake.query().df.count() == 1)
  }
}
