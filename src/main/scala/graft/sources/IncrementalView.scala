package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally maintained materialized aggregate over a lakehouse table
  * (the OLAP summary-table pattern: keep a per-(symbol, date) rollup
  * current without rescanning history). The view's refresh cursor is the
  * TXN LOG VERSION — exactly the mechanism a 100-TB deployment needs,
  * because "what changed since last refresh" is a log read, not a data
  * diff.
  *
  * Refresh contract:
  *  - Commits after the cursor that only ADD files (the append-only fast
  *    path — streaming ingest, batch appends, parquet AND csv via the
  *    lake's per-file format dispatch under the recorded schema): only
  *    the newly added files are scanned; their per-key partial
  *    aggregates MERGE into the standing state by key. Cost tracks the
  *    increment, not the table.
  *  - Any commit in the range that REMOVES files (compaction, DELETE/
  *    UPDATE/MERGE rewrites) forces a full rebuild at the current
  *    snapshot — removals can take back rows already folded into the
  *    state, which decomposable partials cannot un-merge. (Compaction is
  *    row-preserving, but the log doesn't distinguish it from a
  *    row-changing rewrite, so the sound default is rebuild; a rewrite
  *    marker in the commit would upgrade this.)
  *
  * State is decomposable partials — (count, sum volume, sum close·volume,
  * min low, max high) — so merging is a keyed aggregate of unions;
  * [[read]] finalizes (vwap = pv/vol). The state parquet is written to a
  * per-version directory and the cursor file is published by atomic
  * rename LAST, so a crashed refresh leaves the previous state visible
  * and a re-run is idempotent (same version → same directory rewritten,
  * cursor re-points).
  *
  * At scale: partials are (symbol, date)-keyed — many orders smaller than
  * the fact table; the merge shuffles only |delta keys ∪ state keys|
  * rows. The delta scan reads ONLY the added files via basePath-preserved
  * paths, so partition values survive.
  */
object IncrementalView {

  final case class RefreshStats(
      fromVersion: Long, toVersion: Long, mode: String, deltaFiles: Long)

  private def cursorPath(viewDir: String) = Paths.get(viewDir, "_cursor")

  private def stateDir(viewDir: String, v: Long) = s"$viewDir/state-v$v"

  /** Version the state currently reflects, -1 before the first refresh. */
  def currentVersion(viewDir: String): Long =
    if (Files.exists(cursorPath(viewDir)))
      new String(Files.readAllBytes(cursorPath(viewDir)),
        StandardCharsets.UTF_8).trim.toLong
    else -1L

  /** Bring the view up to the lake's current version. No-op when already
    * current. Returns what happened.
    */
  def refresh(lake: DataLakehouse, viewDir: String): RefreshStats = {
    val spark = lake.spark
    Files.createDirectories(Paths.get(viewDir))
    val cur = lake.txnLog.currentVersion()
    val last = currentVersion(viewDir)
    if (cur <= last) return RefreshStats(last, last, "noop", 0L)

    // windowed read: refresh is a POLLING path — it must pay O(new
    // commits), not O(log length) per call
    val range = lake.txnLog.commitsBetween(last, cur)
    val anyRemovals = range.exists(_.removed.nonEmpty)
    val addedAll = range.flatMap(_.added)
    val (partials, mode, nFiles) =
      if (anyRemovals || last < 0L) {
        // full rebuild at the current snapshot
        (partialAgg(lake.query(asOfVersion = Some(cur)).df),
          if (last < 0L) "initial" else "rebuild", -1L)
      } else {
        val added = addedAll
        if (added.isEmpty)
          (loadState(spark, viewDir, last), "noop_merge", 0L)
        else {
          // the delta scan dispatches per file format under the schema
          // RECORDED at the target version (the lake's readRels), so CSV
          // appends — format="csv" tables, mixed-format addFiles — fold
          // incrementally too; an earlier all-parquet delta read forced
          // a full rebuild on any non-parquet add. Partition-value
          // columns are cast to the lakehouse string-key convention so
          // merged state never forks by dtype.
          val raw = lake.readAddedRels(added, cur)
          val delta = lake.partitionCols.foldLeft(raw)((d, c) =>
            d.withColumn(c, col(c).cast("string")))
          val deltaPartials = partialAgg(delta)
          (mergePartials(loadState(spark, viewDir, last), deltaPartials),
            "incremental", added.size.toLong)
        }
      }
    // materialize BEFORE publishing the cursor; per-version dir keeps the
    // previous state readable until the cursor moves
    partials.write.mode("overwrite").parquet(stateDir(viewDir, cur))
    val tmp = Files.createTempFile(Paths.get(viewDir), ".cursor", ".tmp")
    Files.write(tmp, cur.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, cursorPath(viewDir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // every state dir but the one the cursor now references is
    // unreferenced — the direct predecessor AND any stray left by a
    // refresh that crashed between cursor publish and its own cleanup
    // (deleting only `last` left those strays on disk forever)
    val dirs = Files.list(Paths.get(viewDir))
    try {
      import scala.jdk.CollectionConverters._
      dirs.iterator().asScala
        .filter(p => Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("state-v") &&
          p.getFileName.toString != s"state-v$cur")
        .foreach { d =>
          val s = Files.walk(d)
          try s.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => Files.deleteIfExists(p))
          finally s.close()
        }
    } finally dirs.close()
    RefreshStats(last, cur, mode, nFiles)
  }

  /** Finalized view: one row per (symbol, date) with the rollup the
    * partials encode.
    */
  def read(spark: SparkSession, viewDir: String): DataFrame = {
    val v = currentVersion(viewDir)
    require(v >= 0L, s"view at $viewDir has never been refreshed")
    loadState(spark, viewDir, v)
      .select(col("symbol"), col("date"),
        col("n_bars"), col("total_volume"),
        when(col("total_volume") > 0L,
          round(col("pv_sum") / col("total_volume"), 6)).as("vwap"),
        col("lo"), col("hi"))
      .orderBy(col("symbol"), col("date"))
  }

  private def loadState(spark: SparkSession, viewDir: String, v: Long): DataFrame =
    spark.read.parquet(stateDir(viewDir, v))

  private def partialAgg(df: DataFrame): DataFrame =
    df.groupBy(col("symbol"), col("date"))
      .agg(count(lit(1)).as("n_bars"),
        sum(col("volume")).as("total_volume"),
        sum(col("close") * col("volume")).as("pv_sum"),
        min(col("low")).as("lo"),
        max(col("high")).as("hi"))

  private def mergePartials(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("symbol"), col("date"))
      .agg(sum(col("n_bars")).as("n_bars"),
        sum(col("total_volume")).as("total_volume"),
        sum(col("pv_sum")).as("pv_sum"),
        min(col("lo")).as("lo"),
        max(col("hi")).as("hi"))
}
