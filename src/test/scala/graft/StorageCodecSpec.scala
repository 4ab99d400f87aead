package graft

import org.apache.spark.sql.functions._

import graft.sources.StorageCodec

/** The delta storage codec (reference README.md:170-172 "What I'd
  * Improve" — per-symbol price deltas instead of absolutes): lossless
  * round-trip in both ordering modes, loud rejection of non-cent
  * prices and non-unique order keys, delta magnitudes matching the
  * planted walk, and the measured storage effect vs the identical
  * absolute-price layout (per-column, from parquet footers).
  */
class StorageCodecSpec extends SparkSpec {
  import spark.implicits._

  private val priceCols = Seq("open", "high", "low", "close")

  /** A cent-canonical random walk: every price is produced as
    * cents/100.0, so round-trip equality is exact double equality.
    * Walk moves are bounded at ±25 cents per step — the tick-to-tick
    * shape whose deltas the codec exists to exploit. (symbol,
    * timestamp) is unique — the default ordering contract.
    */
  private def walk(n: Int, symbols: Int) = {
    val rows = (0 until n).map { i =>
      val sym = s"S${i % symbols}"
      val step = i / symbols
      def px(seed: Int): Double = {
        var c = 10000L + seed * 100L
        var k = 0
        while (k < step) { c += ((k * 2654435761L + seed) % 51) - 25; k += 1 }
        c / 100.0
      }
      (sym,
        new java.sql.Timestamp(1718409600000L + step.toLong * 1000L),
        px(1), px(2), px(3), px(4), 1000L + i)
    }
    rows.toDF("symbol", "timestamp", "open", "high", "low", "close",
      "volume")
  }

  private def rowSet(d: org.apache.spark.sql.DataFrame) =
    d.select((Seq("symbol", "timestamp", "volume") ++ priceCols).map(col): _*)
      .as[(String, java.sql.Timestamp, Long, Double, Double, Double, Double)]
      .collect().toSet

  test("decode(encode(df)) is exact through parquet, any input row order") {
    val df = walk(4000, 7)
    // shuffle the input ordering: the codec must not depend on it
    val shuffled = df.orderBy(xxhash64($"symbol", $"timestamp", $"volume"))
    val enc = StorageCodec.encodeDeltas(shuffled, priceCols, "symbol",
      Seq("timestamp"))
    // round-trip THROUGH PARQUET (the storage layer whose bytes the
    // codec exists to shrink), so type mapping and file-order
    // shuffling are part of what's pinned
    val dir = tempDir("codecrt")
    enc.write.mode("overwrite").parquet(dir)
    val dec = StorageCodec.decodeDeltas(spark.read.parquet(dir),
      priceCols, "symbol", orderCols = Seq("timestamp"))
    assert(dec.count() == df.count())
    assert(rowSet(dec) == rowSet(df), "round-trip diverged")
  }

  test("storeSeq mode round-trips data whose timestamps tie") {
    // 4 rows per (symbol, timestamp): no unique order key exists, the
    // stored __seq carries the order instead
    val df = walk(2000, 5).withColumn("timestamp",
      timestamp_millis(unix_millis($"timestamp") -
        pmod($"volume", lit(4)) * lit(1000L)))
    val enc = StorageCodec.encodeDeltas(df, priceCols, "symbol",
      Seq("timestamp"), storeSeq = true)
    assert(enc.columns.contains(StorageCodec.SeqCol))
    val dir = tempDir("codecseq")
    enc.write.mode("overwrite").parquet(dir)
    val dec = StorageCodec.decodeDeltas(spark.read.parquet(dir),
      priceCols, "symbol")
    assert(rowSet(dec) == rowSet(df))
  }

  test("per-day grouping restarts deltas and still round-trips exactly") {
    val df = walk(4000, 4)
      .withColumn("timestamp",
        timestamp_millis(unix_millis($"timestamp") +
          pmod($"volume", lit(5)) * lit(86400000L)))
    val enc = StorageCodec.encodeDeltas(
      df.withColumn("date", to_date($"timestamp")),
      priceCols, "symbol", Seq("timestamp"), groupCols = Seq("date"))
    val dec = StorageCodec.decodeDeltas(enc, priceCols, "symbol",
      orderCols = Seq("timestamp"), groupCols = Seq("date")).drop("date")
    assert(rowSet(dec) == rowSet(df))
  }

  test("a non-cent price fails the encode loudly, never rounds silently") {
    val bad = Seq(("A", new java.sql.Timestamp(0L), 1.0 / 3.0, 1.0, 1.0, 1.0,
      1L)).toDF("symbol", "timestamp", "open", "high", "low", "close",
      "volume")
    val e = intercept[Exception] {
      StorageCodec.encodeDeltas(bad, priceCols, "symbol", Seq("timestamp"))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("non-cent price")),
      s"unexpected failure: ${e.getMessage}")
  }

  test("a null price fails the encode loudly, never silently shifts the group") {
    // a null would make the running-sum decode skip the row and carry a
    // permanent additive offset into every later row of the group —
    // silent corruption, so encode must reject it like non-cent prices
    val bad = Seq(
      ("A", new java.sql.Timestamp(0L), Some(1.00), 1.0, 1.0, 1.0, 1L),
      ("A", new java.sql.Timestamp(1000L), None, 1.0, 1.0, 1.0, 2L))
      .toDF("symbol", "timestamp", "open", "high", "low", "close",
        "volume")
    val e = intercept[Exception] {
      StorageCodec.encodeDeltas(bad, priceCols, "symbol", Seq("timestamp"))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("null price")),
      s"unexpected failure: ${e.getMessage}")
  }

  test("cent-canonical prices at very large magnitudes still encode") {
    // the tolerance is ulp-aware: at ~1e8 dollars the double round-trip
    // of a TRUE cent value can exceed an absolute 1e-6 band
    val big = (0 until 50).map { i =>
      val cents = 12345678901234L + i * 7L
      ("A", new java.sql.Timestamp(i.toLong * 1000L),
        cents / 100.0, cents / 100.0, cents / 100.0, cents / 100.0,
        1000L + i)
    }.toDF("symbol", "timestamp", "open", "high", "low", "close",
      "volume")
    val enc = StorageCodec.encodeDeltas(big, priceCols, "symbol",
      Seq("timestamp"))
    val dec = StorageCodec.decodeDeltas(enc, priceCols, "symbol",
      orderCols = Seq("timestamp"))
    assert(rowSet(dec) == rowSet(big))
  }

  test("a non-unique order key fails the encode loudly in default mode") {
    val df = walk(2000, 5).withColumn("timestamp",
      timestamp_millis(unix_millis($"timestamp") -
        pmod($"volume", lit(4)) * lit(1000L)))
    val e = intercept[IllegalArgumentException] {
      StorageCodec.encodeDeltas(df, priceCols, "symbol", Seq("timestamp"))
    }
    assert(e.getMessage.contains("not unique"))
    // the fix the message names: a finer orderCols
    StorageCodec.encodeDeltas(df, priceCols, "symbol",
      Seq("timestamp", "volume"))
  }

  test("encoded deltas match the planted walk bound; price columns shrink") {
    val df = walk(60000, 6)
    val enc = StorageCodec.encodeDeltas(df, priceCols, "symbol",
      Seq("timestamp")).persist()
    try {
      // all rows after each group's first carry deltas bounded by the
      // planted ±25-cent walk; first rows carry absolute cents (~10k)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"symbol").orderBy($"timestamp")
      val maxDelta = enc
        .withColumn("__rn", row_number().over(w)).filter($"__rn" > 1)
        .select(greatest(priceCols.map(p => abs(col(p))): _*).as("d"))
        .agg(max($"d")).as[Long].head()
      assert(maxDelta <= 25L, s"delta $maxDelta exceeds the planted walk")
      // identical layout both sides (one file, zstd, symbol-time
      // sorted): footer-level per-column accounting isolates the codec.
      // The price columns must shrink (delta dictionary = the move
      // alphabet, not the price range); the whole-file effect is
      // reported for the NOTES record.
      def write(d: org.apache.spark.sql.DataFrame): String = {
        val dir = tempDir("codecsz")
        d.coalesce(1).sortWithinPartitions($"symbol", $"timestamp")
          .write.mode("overwrite").option("compression", "zstd").parquet(dir)
        dir
      }
      val absCols = StorageCodec.parquetColumnBytes(write(df))
      val encCols = StorageCodec.parquetColumnBytes(write(enc))
      def priceBytes(m: Map[String, Long]) =
        priceCols.map(m.getOrElse(_, 0L)).sum
      val priceRatio = priceBytes(encCols).toDouble / priceBytes(absCols)
      val fileRatio = encCols.values.sum.toDouble / absCols.values.sum
      info(f"price-column bytes delta/absolute = $priceRatio%.3f " +
        f"(${priceBytes(encCols)}/${priceBytes(absCols)}); " +
        f"whole file = $fileRatio%.3f")
      assert(priceRatio < 0.9,
        f"codec stopped shrinking price columns: $priceRatio%.3f")
    } finally enc.unpersist()
  }
}
