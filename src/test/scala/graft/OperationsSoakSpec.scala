package graft

import java.sql.Timestamp
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong, AtomicReference}

import graft.sources.DataLakehouse

/** Operations soak: every maintenance and read surface running AGAINST a
  * live ingest simultaneously — one busy production day compressed into a
  * bounded burst. Four independent actors, each with its OWN
  * DataLakehouse instance over the same root (the cross-process shape —
  * nothing is coordinated through shared memory):
  *
  *  - WRITER: 40 batch commits of 50 bars each;
  *  - MAINTENANCE: compact + retention-windowed vacuum in a loop;
  *  - CDC POLLER: windowed `commitsBetween` from a moving cursor — must
  *    see every version exactly once, no gaps, no repeats;
  *  - PINNED READER: pins the head version and asserts the DATA count at
  *    that snapshot equals the LOG's recorded row counts — the
  *    metadata/data consistency invariant, checked under full churn.
  *
  * End state: no actor threw, every ingested row present exactly once,
  * verifyIntegrity all-ok, CDC saw the whole contiguous version stream,
  * and a final aggressive vacuum still answers correctly. Each invariant
  * is individually spec'd elsewhere; this test exists because the failure
  * mode of ACID claims is the INTERLEAVING, not the parts.
  */
class OperationsSoakSpec extends SparkSpec {

  test("ingest + compaction + vacuum + CDC + pinned reads, concurrently") {
    val root = tempDir("soaklake")
    val errors = new AtomicReference[List[String]](Nil)
    val stop = new AtomicBoolean(false)
    def actor(name: String)(body: => Unit): Thread =
      new Thread(() => try body catch {
        case e: Throwable =>
          errors.updateAndGet(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}" :: _)
          ()
      }, name)

    val batches = 40
    val rowsPerBatch = 50
    val base = Timestamp.valueOf("2024-06-15 10:00:00").getTime
    val ingested = new AtomicLong(0L)

    val writer = actor("writer") {
      val lake = new DataLakehouse(spark, root)
      (0 until batches).foreach { b =>
        val bars = (0 until rowsPerBatch).map { i =>
          OhlcvBar(s"SYM${b % 7}",
            new Timestamp(base + (b.toLong * rowsPerBatch + i) * 1000L),
            100.0, 101.0, 99.0, 100.5, 1000L + i, AssetClass.Equity)
        }
        lake.ingestBatch(bars)
        ingested.addAndGet(rowsPerBatch.toLong)
        Thread.sleep(5)
      }
    }

    val maintenance = actor("maintenance") {
      val lake = new DataLakehouse(spark, root)
      while (!stop.get()) {
        // retention >> reader pin age: a file live at any recently-pinned
        // version was removed (if at all) within the window, so vacuum
        // can never delete under an active read
        lake.compact(maxFilesPerPartition = 4, targetFiles = 2)
        lake.vacuum(retainMs = 5000L)
        Thread.sleep(50)
      }
    }

    val seenVersions = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    val pollerLake = new DataLakehouse(spark, root)
    def drainCdc(cursor: Long): Long = {
      val head = pollerLake.txnLog.currentVersion()
      if (head <= cursor) cursor
      else {
        pollerLake.txnLog.commitsBetween(cursor, head).foreach { c =>
          seenVersions.merge(c.version, 1L, (a, b) => a + b)
        }
        head
      }
    }
    val poller = actor("cdc") {
      var cursor = -1L
      while (!stop.get()) {
        cursor = drainCdc(cursor)
        Thread.sleep(20)
      }
      drainCdc(cursor) // final drain so the stream is complete at join
      ()
    }

    val reader = actor("reader") {
      val lake = new DataLakehouse(spark, root)
      while (!stop.get()) {
        val v = lake.txnLog.currentVersion()
        if (v >= 0) {
          val dataCount = lake.timeTravel(v).count()
          val live = lake.txnLog.snapshotFiles(v).toSet
          val metaCount = lake.txnLog.rowCountsAt(v)
            .view.filterKeys(live).values.sum
          assert(dataCount == metaCount,
            s"data/metadata drift at v$v: data=$dataCount log=$metaCount")
        }
        Thread.sleep(40)
      }
    }

    Seq(writer, maintenance, poller, reader).foreach(_.start())
    writer.join(180000L)
    assert(!writer.isAlive, "writer did not finish")
    Thread.sleep(100) // let the poller/reader observe the final commits
    stop.set(true)
    Seq(maintenance, poller, reader).foreach(_.join(60000L))
    assert(errors.get().isEmpty, errors.get().mkString(" | "))

    val lake = new DataLakehouse(spark, root)
    // conservation: every ingested row present exactly once, under an
    // unknown number of interleaved compactions and vacuums
    assert(lake.query().count == ingested.get())
    assert(lake.query().df.select("symbol", "timestamp").distinct().count()
      == ingested.get())
    // the CDC stream was gapless and repeat-free up to the head
    val head = lake.txnLog.currentVersion()
    val missed = (0L to head).filterNot(seenVersions.containsKey)
    assert(missed.isEmpty, s"CDC poller missed versions: $missed")
    import scala.jdk.CollectionConverters._
    val repeated = seenVersions.asScala.filter(_._2 > 1L)
    assert(repeated.isEmpty, s"CDC poller repeated versions: $repeated")
    // on-disk bytes still match the log everywhere
    val report = lake.verifyIntegrity().collect()
    assert(report.nonEmpty && report.forall(_.getAs[String]("status") == "ok"))
    // post-soak aggressive maintenance still answers correctly
    lake.compact(maxFilesPerPartition = 0, targetFiles = 1)
    lake.vacuum(retainMs = 0L)
    assert(lake.query().count == ingested.get())
  }
}
