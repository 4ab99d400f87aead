package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** The size gate in front of every FORCED `broadcast()` hint the dedup /
  * similarity verify pipelines plant (the hints deliberately exceed
  * `spark.sql.autoBroadcastJoinThreshold` — a measured design choice: at
  * 128k vectors the un-broadcast verify join degraded to a SortMergeJoin
  * whose left side was the un-deduped candidate mass and spilled ~26G rows
  * to disk-death, where the broadcast form streams the same rows through
  * BHJs touching no disk). Past the gate the hint is DROPPED, not
  * escalated: the join degrades to the id-keyed shuffle form, which
  * completes where a forced broadcast would fail the build.
  *
  * The limit is the RAW-BYTE estimate of the relation (row count × payload
  * bytes); resident heap for a broadcast HashedRelation is typically 2-4×
  * that. The default (256 MiB estimated, ~0.5-1 GiB resident) assumes the
  * 8-32 GiB executors a 100 TB cluster runs; on small-heap deployments set
  * `spark.graft.broadcastGateBytes` to about heap/16 so the gate tracks
  * the memory actually available instead of a hard constant.
  */
private[graft] object BroadcastGate {

  val confKey = "spark.graft.broadcastGateBytes"

  val defaultBytes: Long = 256L << 20

  def bytes(df: DataFrame): Long =
    df.sparkSession.conf.getOption(confKey)
      .map { v =>
        try java.lang.Long.parseLong(v.trim)
        catch {
          // a bare NumberFormatException mid-query never names the conf
          // — fail with the key and offending value so the fix is
          // obvious from the error alone
          case e: NumberFormatException => throw new IllegalArgumentException(
            s"$confKey must be a byte count in decimal long form, " +
              s"got '$v'", e)
        }
      }.getOrElse(defaultBytes)

  /** `broadcast(df)` when the raw-byte estimate fits the gate, `df`
    * untouched otherwise.
    */
  def gated(df: DataFrame, estBytes: Long): DataFrame =
    if (estBytes <= bytes(df)) broadcast(df) else df

  /** Release `caches` if `body` throws before the pipeline's own release
    * path takes ownership of them. The eager pair pipelines run jobs
    * mid-build — the gate's measuring aggregate (and the LSH geometry
    * count) execute at call time — so a failure there (executor loss,
    * task OOM on a skewed corpus, a malformed gate conf, job
    * cancellation) would otherwise strand every internally-persisted
    * intermediate in the CacheManager; in a long-lived session each
    * retried call strands another corpus-sized set, the exact
    * accumulation the eager-release contract exists to prevent.
    * Releasing twice is a no-op, so the happy path's own release
    * composes safely. NonFatal plus InterruptedException: a `return` out
    * of `body` travels as a ControlThrowable and must NOT trigger the
    * release (the returned plan may read the caches); a driver-thread
    * interrupt mid-measuring-job (timeout frameworks cancelling the
    * call) IS a covered cancellation — no plan survives it to need the
    * caches; fatal VM errors are unrecoverable either way.
    */
  def releasingOnFailure[T](caches: => Seq[DataFrame])(body: => T): T =
    try body
    catch {
      case t if scala.util.control.NonFatal(t) ||
          t.isInstanceOf[InterruptedException] =>
        caches.foreach(_.unpersist(blocking = false)); throw t
    }
}
