package graft

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.sources.{DataLakehouse, TxnLog}

/** Safety properties of the txn-log / partition-key layer that only show
  * under concurrency, non-UTC sessions, or schema change — the failure
  * modes a 1000-executor deployment hits first.
  */
class TxnSafetySpec extends SparkSpec {

  // --- S11: concurrent commit atomicity -------------------------------

  test("racing committers never overwrite each other's commits") {
    val root = tempDir("txnrace")
    val perThread = 50
    val nThreads = 2
    // Separate TxnLog instances over the same directory = two independent
    // writers (a streaming foreachBatch plus a driver-side flush()).
    val logs = (0 until nThreads).map(_ => new TxnLog(root))
    val threads = logs.zipWithIndex.map { case (log, t) =>
      new Thread(() => {
        (0 until perThread).foreach { i =>
          log.commit(added = Seq(s"t$t-f$i.parquet"))
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())

    val check = new TxnLog(root)
    val total = nThreads * perThread
    // Every commit got its own version — none was silently replaced.
    assert(check.currentVersion() == total - 1)
    val allAdded = check.commits().flatMap(_.added)
    assert(allAdded.size == total)
    assert(allAdded.distinct.size == total)
    // …and every committed file is live in the final snapshot.
    val expected = (for (t <- 0 until nThreads; i <- 0 until perThread)
      yield s"t$t-f$i.parquet").toSet
    assert(check.snapshotFiles().toSet == expected)
  }

  // --- restore() concurrency: the WriteSerializable contract ----------
  // (ADVICE r5/r6 low items, closed with real-race specs: the hook runs a
  // CONCURRENT writer inside restore's own snapshot-read→commit window.)

  private def raceBar(sym: String, t: String): OhlcvBar =
    OhlcvBar(symbol = sym, timestamp = Timestamp.valueOf(t),
      open = 150.0, high = 155.0, low = 149.0, close = 153.0,
      volume = 1000L, asset_class = AssetClass.Equity)

  test("restore survives a concurrent blind append (WriteSerializable)") {
    // Delta's WriteSerializable level: blind appends commute. A restore
    // must NOT destroy a racing ingest's data — post-restore state =
    // target snapshot + concurrently-added files.
    val root = tempDir("restore-append-race")
    val lake = new DataLakehouse(spark, root)
    lake.ingestBatch(Seq(raceBar("AAPL", "2024-06-15 09:30:00")))
    val v1 = lake.txnLog.currentVersion()
    lake.ingestBatch(Seq(raceBar("MSFT", "2024-06-16 09:30:00")))
    val sibling = new DataLakehouse(spark, root) // concurrent writer
    val v = lake.restoreImpl(v1, () =>
      sibling.ingestBatch(Seq(raceBar("GOOG", "2024-06-17 09:30:00"))))
    assert(v == lake.txnLog.currentVersion())
    val syms = lake.query().df.select("symbol").collect().map(_.getString(0)).toSet
    assert(syms == Set("AAPL", "GOOG"), // MSFT rewound, racing GOOG survives
      s"post-restore live set must be target + concurrent append, got $syms")
  }

  test("restore conflicts with a concurrent rewrite of a dropped file") {
    // The serializable side of the contract: if a concurrent writer
    // rewrote a file this restore REMOVES (requireLive), committing would
    // silently resurrect rows the other writer deleted — the commit must
    // fail instead, and leave no restore commit behind.
    val root = tempDir("restore-rewrite-race")
    val lake = new DataLakehouse(spark, root)
    lake.ingestBatch(Seq(raceBar("AAPL", "2024-06-15 09:30:00")))
    val v1 = lake.txnLog.currentVersion()
    lake.ingestBatch(Seq(raceBar("MSFT", "2024-06-16 09:30:00")))
    val sibling = new DataLakehouse(spark, root)
    val verBefore = lake.txnLog.currentVersion()
    intercept[java.util.ConcurrentModificationException] {
      // the rewrite touches MSFT's file — a member of restore's drop set
      lake.restoreImpl(v1, () => {
        assert(sibling.deleteWhere(col("symbol") === "MSFT") == 1)
      })
    }
    // no restore commit: head is the sibling's delete, nothing more
    val ops = lake.history().select("operation").collect().map(_.getString(0))
    assert(!ops.contains("restore"))
    assert(lake.txnLog.currentVersion() == verBefore + 1) // the delete only
  }

  test("restore vs concurrent vacuum: TOCTOU compensation through the real path") {
    // RestoreSpec drives postRestoreVerify directly; this runs the ACTUAL
    // race — vacuum unlinks the re-add targets inside restore's window
    // (they are dead at the current head, so vacuum reclaims them) — and
    // asserts the documented convergence: compensating commit + loud throw,
    // final live set fully present on disk.
    val root = tempDir("restore-vacuum-race")
    val lake = new DataLakehouse(spark, root)
    lake.ingestBatch(Seq(raceBar("AAPL", "2024-06-15 09:30:00")))
    val v1 = lake.txnLog.currentVersion()
    lake.ingestBatch(Seq(raceBar("AAPL", "2024-06-15 10:30:00")))
    lake.compact(maxFilesPerPartition = 1) // v1's file is now dead
    val sibling = new DataLakehouse(spark, root)
    val e = intercept[RuntimeException] {
      lake.restoreImpl(v1, () => assert(sibling.vacuum(retainMs = 0L) > 0))
    }
    assert(e.getMessage.contains("vacuumed concurrently"))
    val ops = lake.history().select("operation").collect().map(_.getString(0))
    assert(ops.count(_ == "restore-failed") == 1)
    val live = lake.txnLog.snapshotFiles()
    assert(live.forall(r => java.nio.file.Files.isRegularFile(
      java.nio.file.Paths.get(root, r))))
  }

  test("batch ids are visible across TxnLog instances (cross-process exactly-once)") {
    val root = tempDir("txnbatch")
    val a = new TxnLog(root)
    assert(!a.hasBatch("s9-0")) // seeds a's batch cache from the empty log
    // a SECOND instance (sibling or replacement process) commits the batch
    val b = new TxnLog(root)
    b.commit(added = Seq("f0.parquet"), batchId = Some("s9-0"))
    // a's cache was seeded BEFORE b's commit — the miss path must replay
    // the unseen commit tail and find it, not re-run the batch
    assert(a.hasBatch("s9-0"))
    // replaced-driver shape: a cold instance seeds from the log directly
    val c = new TxnLog(root)
    assert(c.hasBatch("s9-0"))
    assert(!c.hasBatch("s9-1"))
  }

  test("commit cost is flat in log length; cold head discovery is O(log commits)") {
    val root = tempDir("txnflat")
    val log = new TxnLog(root)
    (0 until 60).foreach(i => log.commit(added = Seq(s"f$i.parquet")))
    // Version + checkpoint resolution probe forward from the in-process
    // cache: amortized O(1) existence probes per commit (the log dir is
    // never listed — no listing code path exists). 60 commits issue a
    // bounded-constant probe count per commit: cold init (log₂ 1) +
    // per-commit forward misses + checkpoint probes.
    val warmProbes = log.existsProbes.get()
    assert(warmProbes <= 60 * 5,
      s"expected <=5 probes/commit over 60 commits, got $warmProbes")
    // A fresh instance (new process) finds the head by exponential +
    // binary search: O(log commits) probes, never a directory listing
    // and never an O(commits) walk.
    val reopened = new TxnLog(root)
    assert(reopened.currentVersion() == 59L)
    val coldProbes = reopened.existsProbes.get()
    assert(coldProbes <= 2 * 14 + 4, // 2·⌈log₂ 60⌉ phases + slack
      s"cold head discovery not O(log n): $coldProbes probes for 60 commits")
    assert(reopened.snapshotFiles().size == 60)
    // …and a cross-instance commit is visible to the first instance's
    // cached view (forward probe finds foreign commits).
    reopened.commit(added = Seq("foreign.parquet"))
    assert(log.currentVersion() == 60L)
  }

  test("idempotence state is checkpoint-carried: cold streaming restart is O(interval)") {
    val root = tempDir("txnbatchhw")
    val log = new TxnLog(root)
    // two txn apps (the streaming tier) + one plain batch id,
    // interleaved over 41 commits
    (0 until 20).foreach(i =>
      log.commit(added = Seq(s"a$i.parquet"),
        batchId = Some(s"streamA-$i"), txn = Some(("streamA", i.toLong))))
    log.commit(added = Seq("m.parquet"), batchId = Some("day-20240616"))
    (0 until 20).foreach(i =>
      log.commit(added = Seq(s"b$i.parquet"),
        batchId = Some(s"streamB-$i"), txn = Some(("streamB", i.toLong))))
    // cold restart (replaced driver): txn apps resolve against the
    // checkpoint-carried per-app high-water (Delta txn semantics —
    // at-or-below no-ops, next epoch runs)
    val cold = new TxnLog(root)
    assert(cold.hasTxn("streamA", 19))
    assert(cold.hasTxn("streamA", 5)) // below high-water: superseded
    assert(!cold.hasTxn("streamA", 20))
    assert(cold.hasTxn("streamB", 19))
    assert(!cold.hasTxn("streamB", 20))
    // plain batch ids: EXACT membership, no monotonicity inferred from
    // the digits — the out-of-order manual backfill must still run
    assert(cold.hasBatch("day-20240616"))
    assert(!cold.hasBatch("day-20240615"))
    assert(!cold.hasBatch("day-20240617"))
    // seed cost: the newest checkpoint (v40) carries the state — the
    // seed parses at most the post-checkpoint tail, never the 41-commit
    // log (a full replay is minutes of restart latency at the declared
    // 100 ms commit cadence)
    assert(cold.commitReads.get() <= 10L,
      s"cold batch seed parsed ${cold.commitReads.get()} commits, " +
        "expected <= checkpointInterval")
    // cross-instance: a sibling's newer epoch is found via tail replay
    log.commit(added = Seq("c.parquet"),
      batchId = Some("streamA-20"), txn = Some(("streamA", 20L)))
    assert(cold.hasTxn("streamA", 20))
  }

  test("a duplicate txn commit throws inside the commit loop (zombie-driver race)") {
    val root = tempDir("txndup")
    val log = new TxnLog(root)
    log.commit(added = Seq("e5.parquet"), txn = Some(("s", 5L)))
    // the failover replay that already passed its ENTRY check and staged
    // its files: the commit itself must re-validate and refuse — the
    // loser no-ops instead of landing the epoch twice
    intercept[TxnLog.DuplicateTxnException] {
      log.commit(added = Seq("e5b.parquet"), txn = Some(("s", 5L)))
    }
    assert(log.snapshotFiles() == Seq("e5.parquet"))
    // and from a DIFFERENT instance (true cross-driver shape)
    val other = new TxnLog(root)
    intercept[TxnLog.DuplicateTxnException] {
      other.commit(added = Seq("e5c.parquet"), txn = Some(("s", 4L)))
    }
    assert(other.snapshotFiles() == Seq("e5.parquet"))
    // the plain-batchId tier carries the SAME in-commit guard — two
    // processes replaying one manual batch must not both land
    log.commit(added = Seq("m1.parquet"), batchId = Some("manual-1"))
    intercept[TxnLog.DuplicateTxnException] {
      other.commit(added = Seq("m1b.parquet"), batchId = Some("manual-1"))
    }
    assert(new TxnLog(root).snapshotFiles().toSet ==
      Set("e5.parquet", "m1.parquet"))
  }

  test("a FAILED commit never poisons the idempotence view") {
    val root = tempDir("txnpoison")
    val log = new TxnLog(root)
    log.commit(added = Seq("f0.parquet"))
    // the commit validates, records nothing, then throws before publish
    // — were the in-memory view updated eagerly, the never-persisted
    // epoch would no-op on replay and its rows would be lost
    intercept[TxnLog.SchemaConflictException] {
      log.commit(added = Seq("f1.parquet"), batchId = Some("s-1"),
        txn = Some(("s", 1L)), expectedSchema = Some(Some("bogus")))
    }
    assert(!log.hasTxn("s", 1L))
    assert(!log.hasBatch("s-1"))
    // the replay then really commits
    log.commit(added = Seq("f1.parquet"), batchId = Some("s-1"),
      txn = Some(("s", 1L)))
    assert(log.hasTxn("s", 1L))
  }

  test("windowed reads parse O(window) commits; cold snapshot O(checkpoint tail)") {
    val root = tempDir("txnwindow")
    val log = new TxnLog(root)
    (0 until 200).foreach(i => log.commit(added = Seq(s"f$i.parquet")))
    // a CDC poller's shape: cold instance, last-5-versions window — it
    // must parse exactly the 5 window commits, never replay the log
    // (O(n) per poll is O(n²) cumulative at the 100 ms commit cadence)
    val poller = new TxnLog(root)
    val tail = poller.commitsBetween(194L, 199L)
    assert(tail.map(_.version) == (195L to 199L))
    assert(poller.commitReads.get() == 5L,
      s"windowed read parsed ${poller.commitReads.get()} commits, expected 5")
    // cold snapshot resolution: newest checkpoint (v190 at interval 10)
    // + the 9-commit tail — bounded by the interval, not the log length
    val planner = new TxnLog(root)
    assert(planner.snapshotFiles().size == 200)
    assert(planner.commitReads.get() <= 10L,
      s"cold snapshot parsed ${planner.commitReads.get()} commits, " +
        "expected <= checkpointInterval")
  }

  test("versionAsOf binary search == linear replay reference") {
    val root = tempDir("txnasof")
    val log = new TxnLog(root)
    (0 until 30).foreach { i =>
      log.commit(added = Seq(s"f$i.parquet"))
      if (i % 7 == 0) Thread.sleep(5) // force some distinct timestamps
    }
    val all = log.commits()
    def linear(ts: Long): Long =
      all.filter(_.timestampMs <= ts).map(_.version).foldLeft(-1L)(math.max)
    val probes = Seq(all.head.timestampMs - 1, all.head.timestampMs,
      all.last.timestampMs, all.last.timestampMs + 1000) ++
      all.map(_.timestampMs) ++ all.map(_.timestampMs + 1)
    probes.foreach { ts =>
      assert(log.versionAsOf(ts) == linear(ts), s"at ts=$ts")
    }
  }

  test("checkpointed schema/row-count resolution equals full replay") {
    val root = tempDir("txnckpt")
    val log = new TxnLog(root, checkpointInterval = 5)
    (0 until 13).foreach { i =>
      log.commit(added = Seq(s"f$i.parquet"),
        removed = if (i >= 5) Seq(s"f${i - 5}.parquet") else Nil,
        schemaJson = if (i % 4 == 0) Some(s"""{"v":$i}""") else None,
        rowCounts = Map(s"f$i.parquet" -> (100L + i)))
    }
    // checkpoints exist (v5, v10); per-query resolution starts from the
    // newest one — results must equal the ground-truth full replay
    val fullCounts = log.commits()
      .foldLeft(Map.empty[String, Long])((m, c) => m ++ c.rowCounts)
    val live = log.snapshotFiles().toSet
    assert(live == (8 until 13).map(i => s"f$i.parquet").toSet)
    assert(log.rowCountsAt().view.filterKeys(live).toMap ==
      fullCounts.view.filterKeys(live).toMap)
    assert(log.schemaAt() == Some("""{"v":12}"""))
    // a version BELOW the newest checkpoint still resolves correctly
    assert(log.schemaAt(7) == Some("""{"v":4}"""))
    assert(log.rowCountsAt(7).get("f7.parquet") == Some(107L))
  }

  // --- P9/F1: partition key must not depend on session timezone ------

  test("non-UTC session: day-boundary rows survive a date-range query") {
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val lake = new DataLakehouse(spark, tempDir("tzlake"))
      // 2024-06-15T23:30Z and 2024-06-16T00:30Z — both are 06-15 in
      // New York local time; a session-tz-rendered date key would file
      // the second bar under date=2024-06-15 while pruning (UTC) looks
      // for it in 2024-06-16.
      val t0 = 1718494200000L // 2024-06-15T23:30:00Z
      val t1 = 1718497800000L // 2024-06-16T00:30:00Z
      val mk = (ms: Long) => OhlcvBar("AAPL", new Timestamp(ms),
        100.0, 101.0, 99.0, 100.5, 1000L, AssetClass.Equity)
      lake.ingestBatch(Seq(mk(t0), mk(t1)))
      assert(lake.listPartitions() == Seq("2024-06-15", "2024-06-16"))
      val qr = lake.query(
        start = Some(new Timestamp(1718496000000L)), // 2024-06-16T00:00Z
        end = Some(new Timestamp(1718499600000L)))   // 2024-06-16T01:00Z
      assert(qr.df.count() == 1)
      assert(qr.df.select("timestamp").head().getTimestamp(0).getTime == t1)
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  // --- §1.2: schema versions recorded in the txn log ------------------

  test("schema evolution: time travel reads each version's own schema") {
    import spark.implicits._
    val lake = new DataLakehouse(spark, tempDir("schemalake"))
    val base = Seq(OhlcvBar("AAPL", new Timestamp(1718409600000L),
      100.0, 101.0, 99.0, 100.5, 1000L, AssetClass.Equity)).toDF()
    lake.appendDF(base) // v0
    lake.appendDF(base.withColumn("venue", lit("NYSE"))) // v1 adds a column

    val v0 = lake.timeTravel(0)
    assert(!v0.columns.contains("venue"))
    assert(v0.count() == 1)

    // HEAD reads with the evolved schema; pre-evolution files surface the
    // new column as null.
    val head = lake.query().df
    assert(head.columns.contains("venue"))
    assert(head.count() == 2)
    assert(head.filter(col("venue").isNull).count() == 1)

    // mergeSchema read agrees.
    val merged = lake.query(mergeSchema = true).df
    assert(merged.columns.contains("venue"))
    assert(merged.count() == 2)
  }

  test("txn-carried batch ids stay out of the exact set: bounded checkpoints, cross-tier veto") {
    import scala.jdk.CollectionConverters._
    val root = tempDir("txnbounded")
    val log = new TxnLog(root, 5)
    // a txn-FREE batch id enters the exact set (the caller chose the
    // exact tier; its growth is the caller's explicit choice)
    log.commit(added = Seq("seed.parquet"), batchId = Some("manual-X"))
    // the streaming shape: batchId AND txn on every micro-batch
    (0 until 20).foreach { i =>
      log.commit(added = Seq(s"s$i.parquet"),
        batchId = Some(s"stream-$i"), txn = Some(("stream", i.toLong)))
    }
    // BOUNDED: the checkpoint's exact-id array persists only the txn-free
    // id — never the 20 txn-carried stream ids. At the declared 100 ms
    // cadence (864k commits/day) folding those in would grow EVERY
    // checkpoint linearly with commit count (O(commits^2) cumulative
    // checkpoint IO); the txn tier's whole point is the bounded per-app
    // high-water.
    val ckpts = java.nio.file.Files.list(
        java.nio.file.Paths.get(root, "_txn_log")).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("checkpoint-"))
      .toSeq
    assert(ckpts.nonEmpty)
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "_txn_log", ckpts.max)), "UTF-8")
    assert(text.contains("manual-X"))
    assert(!text.contains("stream-1"),
      "txn-carried batch ids must not be checkpoint-persisted")
    // hasBatch read-through: a txn-committed stream batch id answers
    // TRUE via the per-app high-water (O(1) against checkpoint-carried
    // state) even though the exact-id array above provably excludes it —
    // the external-caller sharp edge closed without unbounding
    // checkpoints. An unseen future sequence still answers false.
    val cold = new TxnLog(root, 5)
    assert(cold.hasBatch("manual-X"))
    assert(cold.hasBatch("stream-3"))
    assert(!cold.hasBatch("stream-20"))
    // …and ids outside every recorded app's namespace never read through
    assert(!cold.hasBatch("otherapp-3"))
    // NON-CANONICAL numeric suffixes never read through (ADVICE r11):
    // the committer writes s"$appId-$batchNum" unpadded, so "stream-03"
    // is an id it can never have produced — parsing it to 3 and
    // answering true would veto a genuinely new batch from an external
    // zero-padding caller sharing the app namespace. "0" itself stays
    // canonical.
    assert(!cold.hasBatch("stream-03"))
    assert(!cold.hasBatch("stream-003"))
    assert(cold.hasBatch("stream-0"))
    assert(!cold.hasBatch("stream-00"))
    assert(cold.hasTxn("stream", 19L))
    assert(cold.isDuplicate(Some("stream-3"), Some(("stream", 3L))))
    // cross-tier UPGRADE veto: a payload first committed txn-free under
    // id X, replayed later WITH a freshly-declared txn, is still a
    // duplicate via X's exact-set membership (a txn-only precedence
    // check would double-land it)
    assert(cold.isDuplicate(Some("manual-X"), Some(("newapp", 1L))))
    // ...while a NEW id under a genuinely higher sequence proceeds
    assert(!cold.isDuplicate(Some("stream-20"), Some(("stream", 20L))))
    // THE ASYMMETRY, pinned: hasBatch reads stream-shaped ids through
    // the high-water (truthful answer for external probes), but
    // isDuplicate's batch tier does NOT — a txn-free committer that
    // happens to reuse a live stream's id string must still be allowed
    // to land (read-through inside the commit guard would turn an id
    // namespace collision into a silently skipped batch).
    assert(cold.hasBatch("stream-3"))
    assert(!cold.isDuplicate(Some("stream-3"), None))
  }

  test("legacy checkpoints (unmarked batchIds) never seed the exact set") {
    // Migration hazard (ADVICE r10): id arrays written BEFORE the
    // txn-free-only rule include txn-carried ids, so seeding them could
    // wrongly veto a committer reusing such an id under a strictly
    // HIGHER sequence. An unmarked array must not be read — the seed
    // pays the one-time full replay instead (the streamTxn precedent).
    import scala.jdk.CollectionConverters._
    val root = tempDir("txnlegacyids")
    val log = new TxnLog(root, 5)
    log.commit(added = Seq("m.parquet"), batchId = Some("manual-Y"))
    (0 until 6).foreach { i =>
      log.commit(added = Seq(s"s$i.parquet"),
        batchId = Some(s"stream-$i"), txn = Some(("stream", i.toLong)))
    }
    // forge the legacy form: strip the rule marker and fold a
    // txn-carried id into the array, exactly what pre-rule code wrote
    val logDir = java.nio.file.Paths.get(root, "_txn_log")
    val ckpt = java.nio.file.Files.list(logDir).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("checkpoint-"))
      .toSeq.max
    val p = logDir.resolve(ckpt)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(java.nio.file.Files.readAllBytes(p))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    node.remove("batchIdsTxnFree")
    node.withArray("batchIds").add("stream-4")
    java.nio.file.Files.write(p, mapper.writeValueAsString(node)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val cold = new TxnLog(root, 5)
    // the replay-built view is rule-correct: the exact set holds only
    // the txn-free id, so the higher-sequence reuse of "stream-4"'s id
    // string is NOT vetoed by set membership…
    assert(!cold.isDuplicate(Some("stream-4"), Some(("stream", 7L))))
    // …while genuine replays and the txn-free id still veto
    assert(cold.isDuplicate(Some("stream-4"), Some(("stream", 4L))))
    assert(cold.hasBatch("manual-Y"))
    // and a post-migration checkpoint writes the marked form
    (6 until 11).foreach { i =>
      cold.commit(added = Seq(s"t$i.parquet"),
        batchId = Some(s"stream-$i"), txn = Some(("stream", i.toLong)))
    }
    val newest = java.nio.file.Files.list(logDir).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("checkpoint-"))
      .toSeq.max
    val text = new String(java.nio.file.Files.readAllBytes(
      logDir.resolve(newest)), "UTF-8")
    assert(newest > ckpt && text.contains("\"batchIdsTxnFree\":true"))
    assert(!text.contains("stream-4"))
  }

  test("vacuum removal aging is checkpoint-seeded: O(interval) reads, horizon expiry, guard") {
    val root = tempDir("txntomb")
    val log = new TxnLog(root, 10)
    (0 until 95).foreach { i =>
      log.commit(added = Seq(s"f$i.parquet"),
        removed = if (i >= 5) Seq(s"f${i - 5}.parquet") else Nil)
    }
    // a COLD instance (the maintenance process) resolves removal times
    // from the newest checkpoint + tail — never a full log replay (the
    // pre-fix vacuum re-read every commit per pass: O(commits), minutes
    // within days at the declared 100 ms cadence)
    val cold = new TxnLog(root, 10)
    cold.currentVersion() // head discovery probes, no commit reads
    val before = cold.commitReads.get()
    val tombs = cold.removedTombstones()
    val reads = cold.commitReads.get() - before
    assert(reads <= 10, s"tombstone resolution parsed $reads commits")
    // semantics unchanged: equals the full-replay latest-removal fold
    val full = scala.collection.mutable.HashMap.empty[String, Long]
    cold.commits().foreach { c =>
      c.removed.foreach { f =>
        if (full.getOrElse(f, Long.MinValue) < c.timestampMs)
          full(f) = c.timestampMs
      }
    }
    assert(tombs == full.toMap)

    // horizon expiry: tombstones older than the horizon leave the next
    // checkpoint (they can never matter to a permitted vacuum — the
    // mtime fallback covers those files; soundness note at the resolver)
    val root2 = tempDir("txntomb2")
    val fast = new TxnLog(root2, 2, tombstoneHorizonMs = 1L)
    fast.commit(added = Seq("a.parquet"))
    fast.commit(added = Seq("b.parquet"), removed = Seq("a.parquet"))
    Thread.sleep(5)
    fast.commit(added = Seq("c.parquet")) // v2: checkpoint, tombstone expired
    fast.commit(added = Seq("d.parquet"))
    val cold2 = new TxnLog(root2, 2, tombstoneHorizonMs = 1L)
    assert(!cold2.removedTombstones().contains("a.parquet"))

    // retention beyond the horizon cannot trust the expired checkpoint
    // view — vacuum falls back to the full-replay fold (correct at any
    // window, just not O(interval)); a fresh lake deletes nothing
    val lake = new DataLakehouse(spark, tempDir("tombguard"))
    lake.ingestBatch(Seq(OhlcvBar("AAPL",
      new Timestamp(1718409600000L), 100.0, 101.0, 99.0, 100.5, 1000L,
      AssetClass.Equity)))
    assert(lake.vacuum(retainMs = 31L * 24 * 3600 * 1000) == 0L)
    assert(lake.query().df.count() == 1L)
  }

  test("completed vacuum trims already-deleted tombstones from checkpoints") {
    // Bare-log tier: recordVacuumCutoff drops strictly-older tombstones
    // from subsequent checkpoints — the bound that keeps checkpoint size
    // O(removals since last vacuum) on rewrite-heavy tables, instead of
    // O(all removals within the 30-day horizon).
    val root = tempDir("vactrim")
    val log = new TxnLog(root, 5)
    (0 until 12).foreach { i =>
      log.commit(added = Seq(s"f$i.parquet"),
        removed = if (i > 0) Seq(s"f${i - 1}.parquet") else Nil)
    }
    assert(log.removedTombstones().size == 11) // f0..f10, pre-trim
    Thread.sleep(5) // separate the cutoff from the last commit's ms
    log.recordVacuumCutoff(System.currentTimeMillis())
    (12 until 17).foreach(i => log.commit(added = Seq(s"f$i.parquet"),
      removed = Seq(s"f${i - 1}.parquet")))
    // checkpoint v15 wrote after the record: only post-vacuum removals
    // survive (f11..f15); a cold reader seeds from the trimmed view
    val cold = new TxnLog(root, 5)
    assert(cold.removedTombstones().keySet ==
      (11 to 15).map(i => s"f$i.parquet").toSet)
    // monotone + crash-safe: an older cutoff is a no-op
    val mark = log.lastVacuumCutoff()
    log.recordVacuumCutoff(mark - 1000L)
    assert(log.lastVacuumCutoff() == mark)

    // Lake tier end-to-end: vacuum() records its cutoff on completion,
    // the physical files it reclaimed lose their tombstones at the next
    // checkpoint, and a re-run deletes nothing / answers unchanged.
    val lroot = tempDir("vactrimlake")
    val lake = new DataLakehouse(spark, lroot)
    val base = new Timestamp(1718409600000L)
    (0 until 3).foreach { b =>
      lake.ingestBatch((0 until 5).map(i => OhlcvBar("AAPL",
        new Timestamp(base.getTime + (b * 5 + i) * 60000L),
        100.0, 101.0, 99.0, 100.5, 1000L, AssetClass.Equity)))
    }
    lake.compact(maxFilesPerPartition = 0, targetFiles = 1) // removals
    Thread.sleep(5)
    assert(lake.vacuum(retainMs = 0L) > 0)
    assert(lake.txnLog.lastVacuumCutoff() != Long.MinValue)
    // drive past the next checkpoint boundary; tombstones for the
    // vacuumed files are gone from the cold-seeded view
    (0 until 11).foreach { i =>
      lake.ingestBatch(Seq(OhlcvBar("MSFT",
        new Timestamp(base.getTime + (100 + i) * 60000L),
        100.0, 101.0, 99.0, 100.5, 1000L, AssetClass.Equity)))
    }
    val coldLake = new TxnLog(lroot)
    // every removal predated the vacuum cutoff and its file is reclaimed,
    // so the checkpoint-seeded tombstone view is empty for a cold reader
    assert(coldLake.removedTombstones().isEmpty)
    assert(lake.vacuum(retainMs = 0L) == 0L)
    assert(lake.query().df.count() == 26L)
  }

  test("horizon skew: the trim floor is the writer's persisted cut, not reader config") {
    // A writer with an aggressive horizon expires tombstones EARLY; a
    // maintenance process with the default 30-day horizon must not trust
    // the trimmed view for a 7-day vacuum (the old retainMs<=ownHorizon
    // guard would have — and the mtime fallback deletes files whose
    // removal is inside retention). The floor is persisted per
    // checkpoint by the writer that applied it.
    val root = tempDir("txnskew")
    val writer = new TxnLog(root, 5, tombstoneHorizonMs = 1L)
    (0 until 5).foreach(i => writer.commit(added = Seq(s"f$i.parquet"),
      removed = if (i > 0) Seq(s"f${i - 1}.parquet") else Nil))
    Thread.sleep(10)
    writer.commit(added = Seq("f5.parquet")) // v5 -> checkpoint, all expired
    val reader = new TxnLog(root, 5) // DEFAULT horizon: skewed wider
    assert(reader.removedTombstones().isEmpty) // the trimmed view
    val floor = reader.tombstoneTrimFloor()
    // floor reflects the WRITER's 1 ms horizon (recent), so any sane
    // retention cutoff sits BELOW it -> vacuum takes the full-replay path
    assert(System.currentTimeMillis() - floor < 60000L, s"floor stale: $floor")
    val sevenDayCutoff = System.currentTimeMillis() - 7L * 24 * 3600 * 1000
    assert(sevenDayCutoff < floor)
    assert(reader.latestRemovalFold(reader.commits()).size == 4)
  }

  test("tombstone chain cycle is corruption: loud fallback, never a hang") {
    val root = tempDir("txncycle")
    val log = new TxnLog(root, 5)
    (0 until 11).foreach(i => log.commit(added = Seq(s"f$i.parquet"),
      removed = if (i > 0) Seq(s"f${i - 1}.parquet") else Nil))
    // chain: base sidecar at v5, delta at v10 pointing back at 5 — bend
    // the delta's prev pointer onto itself (parseable JSON, bad pointer)
    import java.nio.file.{Files, Paths}
    val sidecar = Paths.get(root, "_txn_log", "checkpoint-v00000010.tombs.json")
    assert(Files.exists(sidecar))
    val bent = new String(Files.readAllBytes(sidecar), "UTF-8")
      .replace("\"prev\":5", "\"prev\":10")
    assert(bent.contains("\"prev\":10"))
    Files.write(sidecar, bent.getBytes("UTF-8"))
    val cold = new TxnLog(root, 5)
    // resolution detects the non-decreasing pointer, warns, and falls
    // back to the full commit replay — identical answer, bounded time
    assert(cold.removedTombstones() ==
      cold.latestRemovalFold(cold.commits()).toMap)
    // tombstoneView contract (the vacuum TOCTOU fix): a fallback that
    // full-replays is COMPLETE, so its floor is Long.MinValue — vacuum
    // may trust it at any retention cutoff. The two must come from one
    // resolution; this pins the (map, floor) pair a corrupt chain yields.
    val (viewMap, viewFloor) = cold.tombstoneView()
    assert(viewMap == cold.latestRemovalFold(cold.commits()).toMap)
    assert(viewFloor == Long.MinValue)
    // a healthy log's view floor matches the persisted writer cut
    val healthy = new TxnLog(tempDir("txnviewok"), 5)
    (0 until 6).foreach(i => healthy.commit(added = Seq(s"g$i.parquet"),
      removed = if (i > 0) Seq(s"g${i - 1}.parquet") else Nil))
    val (hMap, hFloor) = healthy.tombstoneView()
    assert(hMap == healthy.latestRemovalFold(healthy.commits()).toMap)
    assert(hFloor == healthy.tombstoneTrimFloor())
    assert(hFloor != Long.MinValue) // checkpoint-seeded: floor is real
  }

  test("tombstone chain rebases geometrically and retires superseded files") {
    // 1100 ring commits at interval 10: ~10 removal tombstones per
    // checkpoint. The chain must cross the 1000-entry rebase knee
    // exactly once, and the rebase must delete the superseded sidecars —
    // without it the log dir would hold one sidecar per checkpoint
    // forever and resolution would walk them all.
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = tempDir("txnrebase")
    val log = new TxnLog(root, 10)
    (0 until 1100).foreach { i =>
      log.commit(added = Seq(s"f$i.parquet"),
        removed = if (i > 0) Seq(s"f${i - 1}.parquet") else Nil)
    }
    val sidecars = {
      val s = Files.list(Paths.get(root, "_txn_log"))
      try s.iterator().asScala.map(_.getFileName.toString)
        .count(_.endsWith(".tombs.json"))
      finally s.close()
    }
    // 110 checkpoints wrote 110 sidecars over time; the post-knee rebase
    // retired everything below its base
    assert(sidecars <= 30, s"$sidecars sidecars on disk — rebase cleanup broken")
    // resolution through the rebased chain still equals the full fold
    val cold = new TxnLog(root, 10)
    assert(cold.removedTombstones() ==
      cold.latestRemovalFold(cold.commits()).toMap)
  }

  test("corrupt checkpoints are skipped caches; corrupt commits fail loudly") {
    import java.nio.file.{Files, Paths}
    val root = tempDir("txncorrupt")
    val log = new TxnLog(root, 10)
    (0 until 35).foreach(i => log.commit(added = Seq(s"f$i.parquet")))
    val truth = log.snapshotFiles().toSet
    val ckpt = { v: Long =>
      Paths.get(root, "_txn_log", f"checkpoint-v$v%08d.json") }

    // Bit-rot the NEWEST checkpoint (v30): a cold reader must fall back
    // to the older checkpoint (v20) — same answer, loud warning, never a
    // bricked table. Checkpoints are caches; commits are the truth.
    Files.write(ckpt(30L), "{\"files\": [truncated".getBytes)
    val cold = new TxnLog(root, 10)
    assert(cold.snapshotFiles().toSet == truth)
    // ...and the fallback is remembered: the bad version is not
    // re-parsed per read (one warn, not one per snapshot)
    val before = cold.commitReads.get()
    assert(cold.snapshotFiles().toSet == truth)
    assert(cold.removedTombstones().isEmpty) // same fallback path
    // tail replay from v20 costs <= 15 commits per resolution here
    assert(cold.commitReads.get() - before <= 30)

    // Corrupt EVERY checkpoint: full replay still answers identically.
    Seq(10L, 20L).foreach(v => Files.write(ckpt(v), Array[Byte](0, 1, 2)))
    val cold2 = new TxnLog(root, 10)
    assert(cold2.snapshotFiles().toSet == truth)

    // A NEW checkpoint heals the table for later cold readers: the next
    // interval commit writes v40 and resolution is checkpoint-seeded again.
    (35 until 45).foreach(i => cold2.commit(added = Seq(s"f$i.parquet")))
    assert(Files.exists(ckpt(40L)))
    val cold3 = new TxnLog(root, 10)
    cold3.currentVersion()
    val b3 = cold3.commitReads.get()
    assert(cold3.snapshotFiles().size == 45)
    assert(cold3.commitReads.get() - b3 <= 10)

    // A corrupt COMMIT is table corruption, not a cache miss: loud,
    // actionable failure naming the version — never a silent wrong answer.
    Files.write(Paths.get(root, "_txn_log", "v00000042.json"),
      "not json".getBytes)
    val cold4 = new TxnLog(root, 10)
    Seq(10L, 20L, 30L, 40L).foreach(v => Files.deleteIfExists(ckpt(v)))
    val ex = intercept[IllegalStateException] { cold4.snapshotFiles() }
    assert(ex.getMessage.contains("commit v42"))
    assert(ex.getMessage.contains("source of truth"))
  }

  // --- publishExclusive no-hardlink fallback (ADVICE r13): a mid-write
  // failure on the CREATE_NEW-claimed slot must never DELETE it — a
  // concurrent committer that already saw FileAlreadyExists at v has
  // moved on to v+1, and head discovery assumes contiguous versions, so
  // a gap at v silently truncates every later commit for cold readers.

  private def withPublishSeam(handler: String => Unit)(body: => Unit): Unit = {
    TxnLog.crashSeam = handler
    try body finally TxnLog.crashSeam = null
  }

  test("publish fallback: mid-write failure retries into the claimed slot") {
    val root = tempDir("pubretry")
    val log = new TxnLog(root)
    log.commit(added = Seq("f0.parquet")) // v0 via the normal link path
    val failedOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
    withPublishSeam {
      case "publish:link" =>
        throw new java.nio.file.FileSystemException("seam: no hardlinks")
      case "publish:fallback-claimed" =>
        // one simulated disk hiccup after CREATE_NEW claimed the slot
        if (failedOnce.compareAndSet(false, true))
          throw new java.io.IOException("seam: mid-write failure")
      case _ => ()
    } {
      assert(log.commit(added = Seq("f1.parquet")) == 1L)
    }
    // the retry landed the REAL bytes: a cold reader resolves both commits
    val cold = new TxnLog(root)
    assert(cold.currentVersion() == 1L)
    assert(cold.snapshotFiles().toSet == Set("f0.parquet", "f1.parquet"))
  }

  test("publish fallback: double failure leaves the slot occupied — loud, no gap") {
    val root = tempDir("publoud")
    val log = new TxnLog(root)
    log.commit(added = Seq("f0.parquet"))
    withPublishSeam {
      case "publish:link" =>
        throw new java.nio.file.FileSystemException("seam: no hardlinks")
      case s if s.startsWith("publish:fallback") =>
        throw new java.io.IOException(s"seam: $s failure")
      case _ => ()
    } {
      intercept[java.io.IOException] { log.commit(added = Seq("f1.parquet")) }
    }
    // the claimed slot stays on disk (empty — the failure point), so a
    // concurrent/next committer lands ABOVE it, never inside the gap
    val v1 = java.nio.file.Paths.get(root, "_txn_log", "v00000001.json")
    assert(java.nio.file.Files.exists(v1) &&
      java.nio.file.Files.size(v1) == 0L)
    assert(new TxnLog(root).commit(added = Seq("f2.parquet")) == 2L)
    // cold-start head discovery sees v2 (no silent head=v0 truncation),
    // and reading through the broken v1 fails LOUDLY naming the version
    val cold = new TxnLog(root)
    assert(cold.currentVersion() == 2L)
    val ex = intercept[IllegalStateException] { cold.snapshotFiles() }
    assert(ex.getMessage.contains("v1"))
  }

  test("row counts are recorded at commit and drive scan accounting") {
    val lake = new DataLakehouse(spark, tempDir("rclake"))
    val bars = (0 until 10).map(i => OhlcvBar("AAPL",
      new Timestamp(1718409600000L + i * 1000L),
      100.0, 101.0, 99.0, 100.5, 1000L, AssetClass.Equity))
    lake.ingestBatch(bars)
    val counts = lake.txnLog.rowCountsAt()
    assert(counts.nonEmpty)
    assert(counts.values.sum == 10L)
    assert(lake.query().totalRowsScanned == 10L)
  }

  test("a genuine checkpoint-publish failure is best-effort: referenced chain intact, next interval retries") {
    // a REAL move failure (EIO, quota — not a lost race) must not run
    // the rebase hygiene: dropping the superseded sidecar chain would
    // orphan the still-newest published checkpoint's tombstone
    // references, and advancing the cache would point readers at a
    // checkpoint version that never landed
    val root = tempDir("ckptfail")
    val rootPath = java.nio.file.Paths.get(root)
    val logDir = rootPath.resolve("_txn_log")
    def ckptFile(v: Int) = logDir.resolve(f"checkpoint-v$v%08d.json")
    def tombsFile(v: Int) =
      logDir.resolve(f"checkpoint-v$v%08d.tombs.json")
    val log = new TxnLog(root, 3)
    log.commit(added = Seq("a.parquet"))
    log.commit(added = Seq("b.parquet"))
    log.commit(added = Nil, removed = Seq("a.parquet"))
    log.commit(added = Seq("c.parquet")) // v3: checkpoint + tombs chain
    assert(java.nio.file.Files.exists(ckptFile(3)))
    assert(java.nio.file.Files.exists(tombsFile(3)))
    log.commit(added = Nil, removed = Seq("b.parquet"))
    log.commit(added = Seq("d.parquet"))
    // advance the vacuum floor so the v6 checkpoint takes the REBASE
    // path (new base sidecar + superseded-chain drop) — the hygiene
    // whose misfire the fix guards
    log.recordVacuumCutoff(1L)
    // fail the v6 publish genuinely: vaporize the staged main
    // checkpoint tmp so the ATOMIC_MOVE throws (the sidecar tmp is
    // already moved by this seam)
    TxnLog.crashSeam = n =>
      if (n == "ckpt:tmp-written") {
        val s = java.nio.file.Files.list(logDir)
        try s.iterator().asScala
          .filter(_.getFileName.toString.startsWith(".ckpt"))
          .foreach(java.nio.file.Files.deleteIfExists(_))
        finally s.close()
      }
    try log.commit(added = Seq("e.parquet")) // v6: commit OK, ckpt fails
    finally TxnLog.crashSeam = null
    assert(!java.nio.file.Files.exists(ckptFile(6)),
      "failed publish must not surface a checkpoint")
    // THE regression pin: the v3 chain the still-newest checkpoint
    // references survives the failed v6 attempt
    assert(java.nio.file.Files.exists(tombsFile(3)),
      "superseded-chain drop ran after a failed publish")
    // readers (same instance and cold) still resolve exactly
    assert(log.snapshotFiles(log.currentVersion()).toSet ==
      Set("c.parquet", "d.parquet", "e.parquet"))
    val cold = new TxnLog(root, 3)
    assert(cold.snapshotFiles(cold.currentVersion()).toSet ==
      Set("c.parquet", "d.parquet", "e.parquet"))
    assert(cold.removedTombstones().keySet ==
      Set("a.parquet", "b.parquet"))
    // the next interval retries, publishes, and ONLY THEN drops the
    // superseded chain
    log.commit(added = Seq("f.parquet"))
    log.commit(added = Seq("g.parquet"))
    log.commit(added = Seq("h.parquet")) // v9: checkpoint lands
    assert(java.nio.file.Files.exists(ckptFile(9)))
    assert(java.nio.file.Files.exists(tombsFile(9)))
    assert(!java.nio.file.Files.exists(tombsFile(3)),
      "successful rebase drops the superseded chain")
    val cold2 = new TxnLog(root, 3)
    assert(cold2.snapshotFiles(cold2.currentVersion()).toSet ==
      Set("c", "d", "e", "f", "g", "h").map(_ + ".parquet"))
    assert(cold2.removedTombstones().keySet ==
      Set("a.parquet", "b.parquet"))
  }
}
