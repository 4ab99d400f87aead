package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Distributed heavy hitters via Misra-Gries summaries (Misra & Gries '82;
  * mergeability per Agarwal et al., PODS'12) — the frequent-items
  * primitive for vocabularies too large to count exactly: top URLs /
  * tokens / user-agents over a 100-TB corpus with a summary that fits in
  * one executor's hand.
  *
  * Shape: one `mapPartitions` pass builds an m-counter Misra-Gries
  * summary per partition (amortized O(1)/row; the decrement sweep runs at
  * most n_p/m times); the per-partition summaries — at most m rows each,
  * METADATA-sized — shuffle once and merge by key. Each partition also
  * reports its decrement total d_p, and Σ d_p bounds the global
  * undercount: for every item, merged_count <= true_count <=
  * merged_count + Σ d_p (the mergeable-summaries sandwich). Any item with
  * true count > Σ n_p/m is guaranteed to surface in at least one
  * partition summary, so sizing m to n/(target support) makes the report
  * complete at that support level.
  *
  * With m at or above the true distinct-key count no partition ever
  * evicts, every d_p is 0, and the result is EXACT — which is how the
  * catalog oracles the operator (q78) while the spec separately pins the
  * small-m bounds on adversarial skew.
  */
object HeavyHitters {

  /** Per-item summary: merged lower-bound count plus the global
    * over-/under-count slack. `err_bound` is the same Σ d_p for every
    * row — carried per row so the result is self-describing.
    */
  def summarize(df: DataFrame, keyCol: String, m: Int): DataFrame = {
    require(m > 0, "capacity m must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    // (pid, key, lowerCount, partitionDecrements, real-item flag)
    val partials = df
      .select(spark_partition_id().as("pid"), col(keyCol).cast("string").as("k"))
      .as[(Int, String)]
      .mapPartitions { it =>
        val counters = mutable.HashMap.empty[String, Long]
        var decrements = 0L
        var pid = -1
        it.foreach { case (p, k) =>
          pid = p
          counters.get(k) match {
            case Some(c) => counters.update(k, c + 1)
            case None if counters.size < m => counters.update(k, 1L)
            case None =>
              // decrement sweep: every counter loses 1; zeros evict.
              // Runs at most n_p/m times, so the pass stays O(n_p).
              decrements += 1
              val dead = mutable.ArrayBuffer.empty[String]
              counters.keysIterator.foreach { key =>
                val c = counters(key) - 1
                if (c == 0L) dead += key else counters.update(key, c)
              }
              dead.foreach(counters.remove)
          }
        }
        // a summary can end EMPTY with decrements > 0 (the final sweep
        // evicted every counter): its d_p rides ONLY on emitted rows, so
        // dropping the partition silently SHRANK Σ d_p and the sandwich
        // bound under-reported — emit a keyless carrier row (real=false:
        // it feeds the error bound, never the item counts)
        if (counters.nonEmpty)
          counters.iterator.map { case (k, c) => (pid, k, c, decrements, true) }
        else if (decrements > 0)
          Iterator.single((pid, null: String, 0L, decrements, false))
        else Iterator.empty
      }(Encoders.product[(Int, String, Long, Long, Boolean)])
      .toDF("pid", "k", "cnt", "d", "real")
    // Σ d_p: one row per partition (d repeats on each of its rows);
    // carrier rows participate here and only here
    val errBound = broadcast(
      partials.groupBy($"pid").agg(max($"d").as("dp"))
        .agg(coalesce(sum($"dp"), lit(0L)).as("err_bound")))
    partials
      .filter($"real")
      .groupBy($"k")
      .agg(sum($"cnt").as("est_count"))
      .crossJoin(errBound)
      .select($"k".as(keyCol), $"est_count", $"err_bound")
  }

  /** Top-k most frequent items by merged lower-bound count, deterministic
    * tie-break on the key.
    */
  def topK(df: DataFrame, keyCol: String, k: Int, m: Int): DataFrame =
    summarize(df, keyCol, m)
      .orderBy(col("est_count").desc, col(keyCol))
      .limit(k)
}
