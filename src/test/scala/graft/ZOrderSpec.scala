package graft

import java.sql.Timestamp

import org.apache.hadoop.fs.{Path => HadoopPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

import org.apache.spark.sql.functions._

import graft.functions.ZOrder
import graft.sources.DataLakehouse

/** Z-order clustering (the reference's declared ZORDER BY,
  * README.md:125,134): key correctness against a driver-side reference
  * interleave, and the actual skipping claim — parquet row-group min/max
  * stats must be partial in BOTH clustered dimensions, where linear
  * clustering leaves the secondary dimension spanning every row group.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave matches the driver-side Morton reference, monotone per dim") {
    def mortonRef(a: Long, b: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
    val rng = new scala.util.Random(11)
    val rows = (0 until 200).map(_ =>
      (rng.nextInt(1 << 16).toLong, rng.nextInt(1 << 16).toLong))
    val got = rows.toDF("a", "b")
      .select(ZOrder.interleave(Seq($"a", $"b"), 16).as("z"))
      .as[Long].collect().toSeq
    val want = rows.map { case (a, b) => mortonRef(a, b, 16) }
    assert(got == want)
    // monotone in one dimension with the other fixed
    val fixed = (0L until 100L).map(a => (a, 37L))
    val zs = fixed.toDF("a", "b")
      .select(ZOrder.interleave(Seq($"a", $"b"), 16)).as[Long].collect().toSeq
    assert(zs == zs.sorted && zs.distinct.size == zs.size)
  }

  test("stringRank preserves lexicographic order on symbols") {
    val syms = Seq("AAPL", "AMZN", "GOOGL", "MSFT", "NVDA", "TSLA")
    val ranks = syms.toDF("s").select(ZOrder.stringRank($"s", 16))
      .as[Long].collect().toSeq
    assert(ranks == ranks.sorted && ranks.distinct.size == ranks.size)
  }

  /** Per-row-group (min, max) of a long/binary column across every live
    * parquet file of `lake`, as fractional coverage of the full domain.
    */
  private def rowGroupCoverage(
      lake: DataLakehouse, column: String): Seq[Double] = {
    val conf = spark.sessionState.newHadoopConf()
    val files = lake.txnLog.snapshotFiles().filter(_.endsWith(".parquet"))
    val ranges = files.flatMap { rel =>
      val in = HadoopInputFile.fromPath(
        new HadoopPath(s"${lake.root}/$rel"), conf)
      val r = ParquetFileReader.open(in)
      try {
        import scala.jdk.CollectionConverters._
        def num(v: Any): BigDecimal = v match {
          case b: org.apache.parquet.io.api.Binary =>
            val s = b.toStringUsingUTF8
            BigDecimal((0 until 4).map(i =>
              (if (i < s.length) s(i).toLong else 0L) << (8 * (3 - i))).sum)
          case n => BigDecimal(n.toString)
        }
        r.getFooter.getBlocks.asScala.map { bl =>
          val cc = bl.getColumns.asScala
            .find(_.getPath.toDotString == column).get
          val st = cc.getStatistics
          (num(st.genericGetMin), num(st.genericGetMax))
        }.toSeq
      } finally r.close()
    }
    val lo = ranges.map(_._1).min
    val hi = ranges.map(_._2).max
    val span = (hi - lo).max(1)
    ranges.map { case (a, b) => ((b - a) / span).toDouble }
  }

  private def writeBars(lake: DataLakehouse): Unit = {
    // one day x 32 symbols x 1500 ticks in INTERLEAVED arrival order, so
    // clustering (not arrival luck) decides the file layout; small row
    // groups force many groups per file
    val bars = (0 until 48000).map { i =>
      OhlcvBar(f"SY${i % 32}%02d",
        new Timestamp(1718409600000L + (i / 32).toLong * 57600L), // spans the day
        100 + i % 7, 110 + i % 7, 95 + i % 7, 105 + i % 7, 1000L + i,
        AssetClass.Equity)
    }
    lake.appendDF(spark.createDataset(bars).toDF())
  }

  test("z-order makes row-group stats partial in BOTH dims; linear only in one") {
    val hc = spark.sparkContext.hadoopConfiguration
    val prev = hc.get("parquet.block.size")
    hc.setInt("parquet.block.size", 64 * 1024)
    try {
      val zlake = new DataLakehouse(spark, tempDir("zlake"),
        zorderCols = Seq("symbol", "timestamp"))
      val llake = new DataLakehouse(spark, tempDir("llake"))
      writeBars(zlake); writeBars(llake)

      // correctness first: both layouts hold the same table
      val key = Seq("timestamp", "symbol", "volume").map(col)
      assert(zlake.query().df.orderBy(key: _*).collect().toSeq ==
        llake.query().df.orderBy(key: _*).collect().toSeq)

      val zTs = rowGroupCoverage(zlake, "timestamp")
      val lTs = rowGroupCoverage(llake, "timestamp")
      val zSym = rowGroupCoverage(zlake, "symbol")
      def avg(xs: Seq[Double]) = xs.sum / xs.size
      info(f"row groups: z=${zTs.size} linear=${lTs.size}; " +
        f"ts coverage z=${avg(zTs)}%.2f linear=${avg(lTs)}%.2f; " +
        f"symbol coverage z=${avg(zSym)}%.2f")
      assert(zTs.size > 4 && lTs.size > 4) // the block-size knob worked
      // linear (symbol, timestamp) clustering: timestamp min/max spans
      // ~the whole day in every row group — a time predicate skips nothing
      assert(avg(lTs) > 0.8)
      // z-order: BOTH dimensions' stats are partial per row group
      assert(avg(zTs) < 0.6)
      assert(avg(zSym) < 0.6)
    } finally {
      if (prev == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", prev)
    }
  }
}
