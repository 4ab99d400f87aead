package graft

import java.nio.file.Paths
import java.sql.Timestamp

import graft.sources.DataLakehouse
import graft.streaming.Streaming

/** Hard-kill streaming exactly-once: [[CrashRecoverySpec]] proves the txn
  * log recovers from kills at every commit seam; this spec proves the
  * STREAMING contract built on it (T6) survives the one window a graceful
  * restart test (StreamingSpec "checkpointed restart") never exercises —
  * the writer dies AFTER the lake txn commit published but BEFORE Spark's
  * streaming commit marker, so the restarted query REDELIVERS the batch
  * and only the (streamId, batchId) txn high-water stands between the
  * lake and double-landed rows.
  *
  * Cross-process for the same reason as the other crash specs: an in-JVM
  * "crash" cannot falsify recovery — the dead process's caches and
  * in-memory idempotence state must actually be gone.
  */
class StreamingCrashSpec extends SparkSpec {

  // mirrors build.sbt's jdk17AddOpens: the grandchild JVM runs a real
  // SparkSession outside spark-submit, so it needs the same module opens
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("kill after txn publish, before streaming commit: redelivery no-ops") {
    val root = tempDir("scrash-lake")
    val src = tempDir("scrash-src")
    val ckpt = tempDir("scrash-ckpt")

    // three one-file batches (maxFilesPerTrigger = 1), 10 valid bars each
    import spark.implicits._
    val base = Timestamp.valueOf("2024-06-15 10:30:00").getTime
    (0 until 3).foreach { f =>
      val bars = (0 until 10).map(i => OhlcvBar(s"SYM$f",
        new Timestamp(base + (f * 10 + i) * 60000L),
        150.0, 155.0, 149.0, 153.0, 1000L + i, AssetClass.Equity))
      spark.createDataset(bars).toDF()
        .coalesce(1).write.mode("append").parquet(src)
    }

    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val pb = new ProcessBuilder(
      (Seq(javaBin) ++ addOpens ++ Seq("-Xmx2g",
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", sys.props("java.class.path"),
        "graft.StreamingCrashMain", root, src, ckpt)): _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
    val p = pb.start()
    assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
      "streaming crash child hung")
    assert(p.exitValue() == 9, s"child exited ${p.exitValue()}, expected halt(9)")

    // the child died mid-foreachBatch with batch 0's txn commit PUBLISHED:
    // exactly one file's rows are in the lake, none in the streaming
    // commit log
    val lake = new DataLakehouse(spark, root)
    assert(lake.query().count == 10)

    // restart the SAME checkpoint in this process: Spark redelivers batch
    // 0 (its offsets were WAL'd, its commit marker never written); the txn
    // high-water no-ops it and batches 1..2 land normally
    val q = Streaming.ingestStream(lake, src, ckpt,
      streamId = "crash", triggerMs = 50, maxFilesPerTrigger = Some(1))
    try q.processAllAvailable() finally q.stop()

    assert(lake.query().count == 30)
    // row-granularity exactly-once: every (symbol, timestamp) unique
    assert(lake.query().df.select("symbol", "timestamp")
      .distinct().count() == 30)
    // the redelivered batch produced NO second commit for (crash, 0):
    // one commit per batch id, three in total
    val batchCommits = lake.txnLog.commits()
      .flatMap(_.batchId).filter(_.startsWith("crash-"))
    assert(batchCommits.sorted == Seq("crash-0", "crash-1", "crash-2"))
  }

  test("hard-killed second compaction loses no quote state at either seam") {
    // The in-process seam spec (StreamingSpec) proves the protocol
    // windows; this is the cross-process twin — a real halt(9) in a
    // forked JVM whose half-finished jobs and caches are actually gone —
    // plus the torn-staged-write disk state a kill inside the parquet
    // write would leave (planted deterministically: garbage bytes in a
    // staged dir, which is invisible to readers and swept by the next
    // run).
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val stateDir = tempDir("ccrash-state")
    val t0 = 1718445600000L
    def qb(rows: (String, Long, Long)*) =
      rows.map { case (s, off, id) =>
        (s, new Timestamp(t0 + off), id, 100.0 + id, 101.0 + id) }
        .toDF("qsymbol", "qts", "qid", "bid", "ask")
    def latestBySymbol(): Map[String, Long] =
      spark.read.parquet(stateDir).drop("append")
        .groupBy($"qsymbol")
        .agg(max_by($"qid", struct($"qts", $"qid")).as("qid"))
        .as[(String, Long)].collect().toMap
    Streaming.processQuoteStateBatch(
      qb(("AAPL", 0L, 1L), ("GOOG", 0L, 2L)), 0L, stateDir)
    Streaming.processQuoteStateBatch(qb(("AAPL", 10000L, 3L)), 1L, stateDir)
    assert(Streaming.compactQuoteState(spark, stateDir) == 2L)
    Streaming.processQuoteStateBatch(qb(("AAPL", 20000L, 4L)), 2L, stateDir)
    val expected = Map("AAPL" -> 4L, "GOOG" -> 2L)
    assert(latestBySymbol() == expected)

    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    Seq("compact:staged-written", "compact:renamed").foreach { seam =>
      val pb = new ProcessBuilder(
        (Seq(javaBin) ++ addOpens ++ Seq("-Xmx2g",
          "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
          "-cp", sys.props("java.class.path"),
          "graft.QuoteCompactCrashMain", stateDir, seam)): _*)
      pb.redirectErrorStream(true)
      pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
      val p = pb.start()
      assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
        s"compaction crash child hung at $seam")
      assert(p.exitValue() == 9, s"child exited ${p.exitValue()} at $seam")
      assert(latestBySymbol() == expected, s"state lost after kill at $seam")
    }

    // torn staged write: garbage part file in a dead run's staging dir —
    // never reader-visible, swept by the clean run below
    val torn = Paths.get(stateDir, "_staged-base-deadbeef")
    java.nio.file.Files.createDirectories(torn)
    java.nio.file.Files.write(torn.resolve("part-00000.parquet"),
      Array[Byte](0x50, 0x41, 0x52, 0x7f, 0x00, 0x01))
    assert(latestBySymbol() == expected)

    assert(Streaming.compactQuoteState(spark, stateDir) == 2L)
    assert(latestBySymbol() == expected)
    // exactly one LIVE partition; superseded ones linger tombstoned until
    // retention lapses (deferred deletion = reader snapshot isolation)
    val live = Streaming.liveQuotePartitions(stateDir)
      .map(_.getFileName.toString)
    assert(live.size == 1 && live.head.startsWith("append=base-"), live)
    val names = new java.io.File(stateDir).listFiles().map(_.getName).toSeq
    assert(!names.exists(_.startsWith("_staged-base-")), names)
  }
}
