package graft

import java.sql.Timestamp

import graft.sources.{DataLakehouse, IncrementalView}

/** Incrementally maintained (symbol, date) rollup over the lakehouse:
  * the refresh cursor is the txn-log version; appends merge partials,
  * removals force a rebuild, and at every point the view must equal a
  * full recompute from the current snapshot.
  */
class IncrementalViewSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def bar(day: Int, i: Int, sym: String): OhlcvBar = OhlcvBar(
    symbol = sym,
    timestamp = new Timestamp(
      ts("2024-06-10 09:30:00").getTime + day * 86400000L + i * 60000L),
    open = 150.0 + i, high = 155.0 + i, low = 149.0 - (i % 3),
    close = 153.0 + i, volume = 1000L + 10L * i,
    asset_class = AssetClass.Equity)

  /** Ground truth: the same rollup recomputed from the full snapshot. */
  private def recompute(lake: DataLakehouse) = {
    import org.apache.spark.sql.functions._
    lake.query().df
      .groupBy($"symbol", $"date")
      .agg(count(lit(1)).as("n_bars"),
        sum($"volume").as("total_volume"),
        when(sum($"volume") > 0L,
          round(sum($"close" * $"volume") / sum($"volume"), 6)).as("vwap"),
        min($"low").as("lo"), max($"high").as("hi"))
      .orderBy($"symbol", $"date")
  }

  private def assertMatchesFull(lake: DataLakehouse, viewDir: String): Unit = {
    val got = IncrementalView.read(spark, viewDir).collect().toSeq
    val want = recompute(lake).collect().toSeq
    assert(got == want, s"view=$got\nfull=$want")
  }

  test("initial refresh, incremental appends, and idempotent no-op") {
    val lake = new DataLakehouse(spark, tempDir("mv-lake"), batchSize = 1000)
    val viewDir = tempDir("mv-view")
    lake.ingestBatch((0 until 20).map(i => bar(i % 2, i, "AAPL")))
    val s1 = IncrementalView.refresh(lake, viewDir)
    assert(s1.mode == "initial" && s1.toVersion == 0L)
    assertMatchesFull(lake, viewDir)

    // append-only delta: must take the incremental path and still match
    lake.ingestBatch((20 until 35).map(i => bar(i % 3, i, "GOOG")))
    lake.ingestBatch((35 until 40).map(i => bar(0, i, "AAPL")))
    val s2 = IncrementalView.refresh(lake, viewDir)
    assert(s2.mode == "incremental", s2)
    assert(s2.deltaFiles > 0 && s2.fromVersion == 0L && s2.toVersion == 2L)
    assertMatchesFull(lake, viewDir)

    // already current: no-op, cursor unchanged
    val s3 = IncrementalView.refresh(lake, viewDir)
    assert(s3.mode == "noop" && s3.toVersion == s2.toVersion)
    assertMatchesFull(lake, viewDir)
  }

  test("a removal commit (compaction) forces a rebuild that still matches") {
    val lake = new DataLakehouse(spark, tempDir("mv-lake2"), batchSize = 1000)
    val viewDir = tempDir("mv-view2")
    lake.ingestBatch((0 until 10).map(i => bar(0, i, "AAPL")))
    IncrementalView.refresh(lake, viewDir)
    lake.ingestBatch((10 until 20).map(i => bar(0, i, "AAPL")))
    lake.compact() // adds AND removes → partials can't be un-merged
    val s = IncrementalView.refresh(lake, viewDir)
    assert(s.mode == "rebuild", s)
    assertMatchesFull(lake, viewDir)
  }

  test("CSV appends ride the incremental delta path — zero rebuilds, view equals full") {
    // the delta scan dispatches per file format through the lake's
    // readRels under the recorded schema, so a format="csv" lake folds
    // appends incrementally. (History: non-parquet adds were first
    // silently FILTERED out of the delta while the cursor advanced — a
    // forever-stale view — then fixed correct-over-fast with a full
    // rebuild per refresh; this pins the fast path.)
    val lake = new DataLakehouse(spark, tempDir("mv-lake4"),
      batchSize = 1000, format = "csv")
    val viewDir = tempDir("mv-view4")
    lake.ingestBatch((0 until 10).map(i => bar(0, i, "AAPL")))
    assert(IncrementalView.refresh(lake, viewDir).mode == "initial")
    assertMatchesFull(lake, viewDir)
    lake.ingestBatch((10 until 20).map(i => bar(1, i, "GOOG")))
    lake.ingestBatch((20 until 25).map(i => bar(0, i, "AAPL")))
    val s = IncrementalView.refresh(lake, viewDir)
    assert(s.mode == "incremental" && s.deltaFiles > 0, s)
    assertMatchesFull(lake, viewDir) // GOOG + late AAPL rows ARE in the view
    // append-only refreshes on a CSV lake never rebuild
    lake.ingestBatch((25 until 30).map(i => bar(2, i, "MSFT")))
    val s2 = IncrementalView.refresh(lake, viewDir)
    assert(s2.mode == "incremental", s2)
    assertMatchesFull(lake, viewDir)
  }

  test("refresh sweeps stray state dirs from a crashed predecessor") {
    val lake = new DataLakehouse(spark, tempDir("mv-lake5"), batchSize = 1000)
    val viewDir = tempDir("mv-view5")
    lake.ingestBatch((0 until 10).map(i => bar(0, i, "AAPL")))
    IncrementalView.refresh(lake, viewDir)
    // a refresh killed between cursor publish and its own cleanup
    // leaves an unreferenced state dir; the next refresh must sweep it
    // (deleting only the direct predecessor left it on disk forever)
    val stray = java.nio.file.Paths.get(viewDir, "state-v99")
    java.nio.file.Files.createDirectories(stray)
    lake.ingestBatch((10 until 15).map(i => bar(0, i, "AAPL")))
    IncrementalView.refresh(lake, viewDir)
    assert(!java.nio.file.Files.exists(stray))
    val dirs = new java.io.File(viewDir).listFiles()
      .map(_.getName).filter(_.startsWith("state-v")).toSeq
    assert(dirs == Seq(s"state-v${IncrementalView.currentVersion(viewDir)}"), dirs)
    assertMatchesFull(lake, viewDir)
  }

  test("refresh fuzz: random append/delete/compact/refresh mixes always match full recompute") {
    // composes the deterministic mode specs: whatever interleaving of
    // appends, row deletes, compactions, and refreshes occurs, a refresh
    // must leave the view equal to a full recompute of the current
    // snapshot. Fixed seeds, the TombstoneFuzzSpec pattern.
    import org.apache.spark.sql.functions.col
    Seq(5L, 17L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val lake = new DataLakehouse(spark, tempDir(s"mv-fuzz$seed"),
        batchSize = 1000)
      val viewDir = tempDir(s"mv-fuzzv$seed")
      var nextI = 0
      def append(): Unit = {
        val n = 3 + rnd.nextInt(5)
        lake.ingestBatch((nextI until nextI + n).map(i =>
          bar(rnd.nextInt(3), i, s"SYM${rnd.nextInt(3)}")))
        nextI += n
      }
      append()
      IncrementalView.refresh(lake, viewDir)
      assertMatchesFull(lake, viewDir)
      (0 until 12).foreach { _ =>
        rnd.nextInt(4) match {
          case 0 | 1 => append()
          case 2 if lake.query().count > 4 =>
            lake.deleteWhere(col("volume") >= 1000L + 10L * (nextI - 2))
          case 2 => ()
          case 3 => lake.compact(maxFilesPerPartition = 0)
        }
        IncrementalView.refresh(lake, viewDir)
        assertMatchesFull(lake, viewDir)
      }
    }
  }

  test("row-level delete invalidates folded state via rebuild") {
    val lake = new DataLakehouse(spark, tempDir("mv-lake3"), batchSize = 1000)
    val viewDir = tempDir("mv-view3")
    lake.ingestBatch((0 until 10).map(i => bar(0, i, "AAPL")))
    IncrementalView.refresh(lake, viewDir)
    import org.apache.spark.sql.functions.col
    lake.deleteWhere(col("volume") >= 1050L) // drops half the rows
    val s = IncrementalView.refresh(lake, viewDir)
    assert(s.mode == "rebuild", s)
    assertMatchesFull(lake, viewDir)
  }
}
