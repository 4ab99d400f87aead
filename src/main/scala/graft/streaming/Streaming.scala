package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery, Trigger}

import graft.model
import graft.sources.DataLakehouse

/** Input/state/output records for the custom-state operators (T-series:
  * mapGroupsWithState needs product encoders at top level).
  */
final case class SymbolTick(symbol: String, price: Double, volume: Long)
final case class VwapState(pv: Double, vol: Double, n: Long)
final case class VwapUpdate(symbol: String, vwap: Double, nTicks: Long)

final case class TsTick(symbol: String, tsMs: Long, price: Double, volume: Long)
final case class OpenBar(barStartMs: Long, open: Double, high: Double,
    low: Double, close: Double, volume: Long)
final case class ClosedBar(symbol: String, barStartMs: Long, open: Double,
    high: Double, low: Double, close: Double, volume: Long)

/** Streaming tier (SURVEY.md §2.9): the reference's declared ring-buffer →
  * 100 ms flush ingest path (README.md:36-37,50,127) re-expressed as
  * Structured Streaming, plus the windowed-aggregation/dedup surface.
  *
  * Exactly-once (T6): every micro-batch commits to the lakehouse txn log
  * keyed by (streamId, batchId); a replayed batch after failure is a no-op
  * because the log already contains that key. Combined with checkpointing,
  * ingestion accounting is exactly-once end-to-end.
  */
object Streaming {

  /** File-source streaming ingest (S9/T1/T2/S10): parquet files dropped in
    * `sourceDir` are validated, appended to the lakehouse in one txn-log
    * commit per micro-batch, and rejects land in the DLQ — all inside
    * `foreachBatch`, at a 100 ms trigger cadence by default.
    */
  def ingestStream(
      lake: DataLakehouse,
      sourceDir: String,
      checkpointDir: String,
      streamId: String = "ingest",
      triggerMs: Long = 100L): StreamingQuery = {
    lake.spark.readStream
      .schema(model.ohlcvSchema)
      .parquet(sourceDir)
      .writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(s"$triggerMs milliseconds"))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val valid = batch.filter(model.barValid)
        val invalid = batch.filter(!model.barValid)
        lake.appendDF(valid, batchId = Some(s"$streamId-$batchId"))
        if (!invalid.isEmpty)
          invalid.withColumn("_rejected_at", current_timestamp())
            .write.mode("append").parquet(s"${lake.root}/_dlq")
        ()
      }
      .start()
  }

  /** Tick → OHLCV bar resampling (T3, the streaming twin of batch A7):
    * tumbling window per symbol with a watermark bounding state (T4).
    * Works on both streaming and batch DataFrames with columns
    * (ts: timestamp, symbol, price, volume).
    */
  def tickToBars(
      ticks: DataFrame,
      windowLength: String = "1 minute",
      watermarkDelay: String = "10 minutes"): DataFrame =
    ticks
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("symbol"), window(col("ts"), windowLength))
      .agg(
        min_by(col("price"), col("ts")).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), col("ts")).as("close"),
        sum(col("volume")).as("volume"))
      .select(col("symbol"), col("window.start").as("bar_start"),
        col("open"), col("high"), col("low"), col("close"), col("volume"))

  /** Sliding-window variant (T7). */
  def slidingBars(
      ticks: DataFrame,
      windowLength: String = "10 minutes",
      slide: String = "1 minute",
      watermarkDelay: String = "10 minutes"): DataFrame =
    ticks
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("symbol"), window(col("ts"), windowLength, slide))
      .agg(avg(col("price")).as("avg_price"), sum(col("volume")).as("volume"))
      .select(col("symbol"), col("window.start").as("win_start"),
        col("avg_price"), col("volume"))

  /** Session windows per key (T7): gap-based sessionization. */
  def sessionize(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      gap: String = "5 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  /** Custom stateful streaming operator (SURVEY §2.9 /
    * KeyValueGroupedDataset.mapGroupsWithState): running exact VWAP per
    * symbol, state carried across micro-batches. Emits one update per
    * touched symbol per batch (Update output mode). State is two doubles
    * and a count per live symbol — bounded by symbol cardinality, not
    * stream length.
    */
  def runningVwap(ticks: Dataset[SymbolTick]): Dataset[VwapUpdate] = {
    import ticks.sparkSession.implicits._
    ticks
      .groupByKey(_.symbol)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (sym: String, it: Iterator[SymbolTick], state: GroupState[VwapState]) =>
          val s1 = it.foldLeft(state.getOption.getOrElse(VwapState(0, 0, 0))) {
            (s, t) => VwapState(s.pv + t.price * t.volume, s.vol + t.volume, s.n + 1)
          }
          state.update(s1)
          VwapUpdate(sym, s1.pv / s1.vol, s1.n)
      }
  }

  /** Append-mode custom state (flatMapGroupsWithState): close-on-advance
    * bar construction. A symbol's in-progress bar lives in state; when a
    * tick from a later minute arrives, every completed minute's bar is
    * EMITTED (append semantics — each bar exactly once) and the new open
    * bar replaces the state. Complements [[tickToBars]]: that form emits
    * evolving aggregates per trigger; this one emits only finalized bars,
    * the contract a downstream lakehouse append wants.
    */
  def barCloser(ticks: Dataset[TsTick],
      barMs: Long = 60000L): Dataset[ClosedBar] = {
    import ticks.sparkSession.implicits._
    ticks
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (sym: String, it: Iterator[TsTick], state: GroupState[OpenBar]) =>
          val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedBar]
          var cur = state.getOption
          it.toSeq.sortBy(t => (t.tsMs, t.price)).foreach { t =>
            val start = t.tsMs - (t.tsMs % barMs)
            cur match {
              case Some(b) if b.barStartMs == start =>
                cur = Some(b.copy(high = math.max(b.high, t.price),
                  low = math.min(b.low, t.price), close = t.price,
                  volume = b.volume + t.volume))
              case Some(b) =>
                closed += ClosedBar(sym, b.barStartMs, b.open, b.high, b.low,
                  b.close, b.volume)
                cur = Some(OpenBar(start, t.price, t.price, t.price, t.price,
                  t.volume))
              case None =>
                cur = Some(OpenBar(start, t.price, t.price, t.price, t.price,
                  t.volume))
            }
          }
          cur.foreach(state.update)
          closed.iterator
      }
  }

  /** Streaming dedup within the watermark horizon (T5: README.md:41's
    * dedup gate, stateful form).
    */
  def dedupWithinWatermark(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      watermarkDelay: String = "10 minutes"): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
}
