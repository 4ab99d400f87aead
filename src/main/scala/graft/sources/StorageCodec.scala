package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series delta storage codec — the reference README's last
  * unbuilt hypothesis (README.md:170-172, "What I'd Improve": store
  * per-symbol price deltas instead of absolute prices).
  *
  * [[encodeDeltas]] rewrites each price column as integer-CENT deltas
  * along the per-group time order (the first row of each group keeps
  * its absolute cents). Prices must be cent-quantized — validated per
  * value at encode (`raise_error` on violation) because silently
  * rounding a non-cent price would make the codec lossy. Decoded
  * prices are the canonical double of cents/100 — bit-identical to any
  * input that was itself produced as cents/100.0, and cent-identical
  * always.
  *
  * Ordering contract (what makes decode exact): by default the caller
  * promises `orderCols` is UNIQUE within a (symbol, group) — true of
  * any tick/bar feed with a proper event key — and encode VERIFIES it
  * (one count-vs-distinct pass, loud on violation); decode then
  * replays the same order. With `storeSeq = true` the codec instead
  * persists an explicit `__seq` column and needs no uniqueness — but
  * the measured cost of storing it (a dictionary-encoded int per row)
  * EXCEEDS the price-column saving on realistic shapes, so unique-key
  * mode is the default and the stored-seq mode exists for keyless
  * data.
  *
  * Scale shape: one window per (symbol, day) group when `groupCols`
  * carries the date — the SAME symbol-major/time-minor co-location the
  * clustered lakehouse write already establishes, and the day grain
  * bounds per-task window state (a symbol's FULL history in one window
  * partition would not fit an executor at 100 TB; one absolute row per
  * symbol-day is noise). Parquet then stores small-magnitude integers
  * (tick-to-tick moves) whose dictionary is the MOVE alphabet (~tick
  * sizes), not the price RANGE the absolutes pay for.
  *
  * OPT-IN, deliberately not wired into the DataLakehouse default
  * layout. Measured (Bench storage metrics, 2M bars, identical
  * (date,symbol,ts)-clustered zstd layout both sides): on REALISTIC
  * walk-shaped prices the encoded file is 0.57x the absolute layout
  * (price columns alone 0.42x) — the reference's hypothesis holds; on
  * low-cardinality synthetic prices (df2m's 100-value cycle) parquet's
  * dictionary already saturates and the codec buys nothing. The
  * default layout keeps absolute doubles because they leave price
  * predicates pushable and files readable by any parquet consumer
  * without the decode step; apply the codec around appendDF/scan when
  * storage dominates those concerns.
  */
object StorageCodec {

  /** Explicit-order column (`storeSeq = true` mode only). */
  val SeqCol = "__seq"

  private def centsOf(c: Column, name: String): Column = {
    val scaled = c * lit(100.0)
    val cents = round(scaled)
    // tolerance is ulp-aware: a TRUE cents/100.0 value carries at most
    // ~1 ulp of scaled-value noise through the divide/multiply round
    // trip, so at large magnitudes a fixed absolute band would
    // spuriously raise on lossless data. 1e-15 relative ≈ 4.5 ulps —
    // generous for genuine cents, still far below any representable
    // sub-cent tick it must keep rejecting.
    val tol = greatest(lit(1e-6), abs(scaled) * lit(1e-15))
    when(c.isNull,
      raise_error(lit(s"delta codec: null price in '$name' — the " +
        "running-sum decode would silently shift every later row; " +
        "filter or fill nulls before encoding")))
      .when(abs(scaled - cents) > tol,
        raise_error(concat(
          lit(s"delta codec: non-cent price in '$name': "),
          c.cast("string"))))
      .otherwise(cents.cast("long"))
  }

  /** Encode: each price column becomes its per-(symbol, group) cent
    * delta in `orderCols` order; the first row per group keeps absolute
    * cents. Default mode verifies (symbol, groupCols, orderCols) is a
    * unique key — the decode ordering contract — and stores nothing
    * extra; `storeSeq = true` persists `__seq` instead (no uniqueness
    * needed, measurably worse storage).
    */
  def encodeDeltas(
      df: DataFrame,
      priceCols: Seq[String],
      symbolCol: String,
      orderCols: Seq[String],
      groupCols: Seq[String] = Nil,
      storeSeq: Boolean = false): DataFrame = {
    require(priceCols.nonEmpty, "priceCols must not be empty")
    require(orderCols.nonEmpty, "orderCols must not be empty")
    val part = (symbolCol +: groupCols).map(col)
    val keyCols = (symbolCol +: groupCols) ++ orderCols
    if (!storeSeq) {
      // the decode contract: orderCols must give ONE total order per
      // group. One aggregate pass; loud at encode beats silent price
      // corruption at decode.
      val Array(rows, keys) = df
        .agg(count(lit(1)), count_distinct(struct(keyCols.map(col): _*)))
        .head().toSeq.map(_.asInstanceOf[Long]).toArray
      require(rows == keys,
        s"delta codec: (${keyCols.mkString(", ")}) is not unique " +
          s"($rows rows, $keys distinct keys) — pass storeSeq = true " +
          "or a finer orderCols")
    }
    val w = Window.partitionBy(part: _*)
      .orderBy((orderCols ++ priceCols).map(col): _*)
    val seqd =
      if (storeSeq) df.withColumn(SeqCol, row_number().over(w))
      else df
    val deltaOrder: Seq[Column] =
      if (storeSeq) Seq(col(SeqCol)) else orderCols.map(col)
    val ws = Window.partitionBy(part: _*).orderBy(deltaOrder: _*)
    val withCents = priceCols.foldLeft(seqd)((d, p) =>
      d.withColumn(s"__c_$p", centsOf(col(p), p)))
    val out = priceCols.foldLeft(withCents)((d, p) =>
      d.withColumn(p,
        col(s"__c_$p") - coalesce(lag(col(s"__c_$p"), 1).over(ws), lit(0L))))
    out.drop(priceCols.map(p => s"__c_$p"): _*)
  }

  /** Decode: cumulative-sum each delta column back to absolute cents
    * (in `__seq` order when the frame carries it, else in `orderCols`
    * order — the same symbol/group/order columns the encode used),
    * divide back to the canonical double.
    */
  def decodeDeltas(
      df: DataFrame,
      priceCols: Seq[String],
      symbolCol: String,
      orderCols: Seq[String] = Nil,
      groupCols: Seq[String] = Nil): DataFrame = {
    val part = (symbolCol +: groupCols).map(col)
    val hasSeq = df.columns.contains(SeqCol)
    require(hasSeq || orderCols.nonEmpty,
      "delta codec: frame has no __seq — pass the encode's orderCols")
    val decodeOrder: Seq[Column] =
      if (hasSeq) Seq(col(SeqCol)) else orderCols.map(col)
    val ws = Window.partitionBy(part: _*).orderBy(decodeOrder: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = priceCols.foldLeft(df)((d, p) =>
      d.withColumn(p, sum(col(p)).over(ws) / lit(100.0)))
    if (hasSeq) out.drop(SeqCol) else out
  }

  /** Compressed bytes per column across every parquet file under `dir`
    * (footer metadata only, no data IO) — the storage experiment's
    * per-column accounting.
    */
  def parquetColumnBytes(dir: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = new org.apache.hadoop.conf.Configuration()
    val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    val files =
      try s.iterator().asScala.filter(_.toString.endsWith(".parquet")).toList
      finally s.close()
    files.flatMap { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.toString), conf))
      try r.getFooter.getBlocks.asScala.toList.flatMap(_.getColumns.asScala
        .map(c => c.getPath.toDotString -> c.getTotalSize))
      finally r.close()
    }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
  }
}
