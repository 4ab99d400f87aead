package graft

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.sources.DataLakehouse

/** Property-based invariants (SURVEY.md §5.2-3): ingest→query round-trip,
  * pruning soundness, constraint-rejection completeness, snapshot
  * monotonicity under append-only commits.
  *
  * Uses raw ScalaCheck generators sampled from fixed seeds (the
  * scalatest-scalacheck bridge isn't in the offline dependency cache);
  * 5 deterministic samples per property.
  */
class PropertySpec extends SparkSpec {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default.withSize(30), Seed(seed))
      .getOrElse(sys.error("gen failed"))

  private def seeds: Seq[Long] = Seq(1L, 7L, 42L, 99L, 1234L)

  private val baseMs = Timestamp.valueOf("2024-06-10 00:00:00").getTime

  private val genValidBar: Gen[OhlcvBar] = for {
    sym <- Gen.oneOf("AAPL", "GOOGL", "MSFT")
    dayOff <- Gen.choose(0, 4)
    secOff <- Gen.choose(0, 86399)
    low <- Gen.choose(10.0, 100.0)
    spread <- Gen.choose(0.0, 50.0)
    openF <- Gen.choose(0.0, 1.0)
    closeF <- Gen.choose(0.0, 1.0)
    vol <- Gen.choose(0L, 1000000L)
    ac <- Gen.oneOf(AssetClass.all)
  } yield OhlcvBar(sym,
    new Timestamp(baseMs + dayOff * 86400000L + secOff * 1000L),
    open = low + openF * spread, high = low + spread, low = low,
    close = low + closeF * spread, volume = vol, asset_class = ac)

  private val genInvalidBar: Gen[OhlcvBar] =
    genValidBar.map(b => b.copy(high = b.low - 1.0, open = b.low, close = b.low))

  test("round-trip: ingest then query-all returns exactly the bars, sorted") {
    seeds.foreach { seed =>
      val bars = sample(Gen.nonEmptyListOf(genValidBar), seed)
      val lake = new DataLakehouse(spark, tempDir("prop"))
      lake.ingestBatch(bars)
      val got = lake.query().df.collect()
      assert(got.length == bars.size, s"seed=$seed")
      val gotTs = got.map(_.getAs[Timestamp]("timestamp").getTime).toSeq
      assert(gotTs == gotTs.sorted, s"seed=$seed")
      val expect = bars.map(b => (b.symbol, b.timestamp.getTime, b.volume)).sorted
      val actual = got.map(r => (r.getAs[String]("symbol"),
        r.getAs[Timestamp]("timestamp").getTime, r.getAs[Long]("volume"))).toSeq.sorted
      assert(actual == expect, s"seed=$seed")
    }
  }

  test("pruning soundness: ranged query == full scan filtered") {
    seeds.foreach { seed =>
      val bars = sample(Gen.nonEmptyListOf(genValidBar), seed)
      val lake = new DataLakehouse(spark, tempDir("prop"))
      lake.ingestBatch(bars)
      val lo = new Timestamp(baseMs + 86400000L)      // day 1
      val hi = new Timestamp(baseMs + 3 * 86400000L)  // day 3
      val pruned = lake.query(start = Some(lo), end = Some(hi)).count
      val reference = bars.count(b =>
        !b.timestamp.before(lo) && !b.timestamp.after(hi))
      assert(pruned == reference, s"seed=$seed")
    }
  }

  test("file-stats pruning soundness: random symbol+range probes == in-memory filter") {
    // The log-side file pruning's failure mode is silently LOSING rows —
    // this drives the combined partition + file-stats path with seeded
    // random probes against the literal in-memory definition, across
    // multi-commit layouts, a mid-history compaction, and post-vacuum.
    seeds.take(3).foreach { seed =>
      val rng = new scala.util.Random(seed)
      val lake = new DataLakehouse(spark, tempDir("propstats"))
      val all = scala.collection.mutable.ArrayBuffer.empty[OhlcvBar]
      (0 until 5).foreach { i =>
        val batch = sample(Gen.nonEmptyListOf(genValidBar), seed * 100 + i)
        // alternate mixed batches with single-symbol batches so some
        // files carry narrow symbol bounds and some carry wide ones
        val b2 = if (i % 2 == 1) batch.map(_.copy(symbol = "AAPL")) else batch
        all ++= b2
        lake.ingestBatch(b2)
        if (i == 2) { lake.compact(maxFilesPerPartition = 0, targetFiles = 2); lake.vacuum(retainMs = 0L) }
      }
      (0 until 12).foreach { probe =>
        val sym = rng.nextInt(4) match {
          case 0 => None
          case 1 => Some("ZZZ") // never present
          case _ => Some(Seq("AAPL", "GOOGL", "MSFT")(rng.nextInt(3)))
        }
        val lo = if (rng.nextBoolean()) Some(new Timestamp(
          baseMs + rng.nextInt(5) * 86400000L + rng.nextInt(86400) * 1000L)) else None
        val hi = if (rng.nextBoolean()) Some(new Timestamp(
          baseMs + rng.nextInt(5) * 86400000L + rng.nextInt(86400) * 1000L)) else None
        val got = lake.query(symbol = sym, start = lo, end = hi).count
        val want = all.count { b =>
          sym.forall(_ == b.symbol) &&
            lo.forall(!b.timestamp.before(_)) && hi.forall(!b.timestamp.after(_))
        }
        assert(got == want, s"seed=$seed probe=$probe sym=$sym lo=$lo hi=$hi")
      }
    }
  }

  test("rejection completeness: invalid bars never reach the table") {
    seeds.foreach { seed =>
      val ok = sample(Gen.listOf(genValidBar), seed)
      val bad = sample(Gen.listOf(genInvalidBar), seed + 1000)
      val lake = new DataLakehouse(spark, tempDir("prop"))
      val mixed = new scala.util.Random(seed).shuffle(ok ++ bad)
      val stats = lake.ingestBatch(mixed)
      assert(stats.rowsIngested == ok.size, s"seed=$seed")
      assert(stats.errors == bad.size, s"seed=$seed")
      assert(lake.query().count == ok.size, s"seed=$seed")
    }
  }

  test("snapshot monotonicity: append-only commits only grow the file set") {
    seeds.take(2).foreach { seed =>
      val batches = (0 until 3).map(i =>
        sample(Gen.nonEmptyListOf(genValidBar), seed + i))
      val lake = new DataLakehouse(spark, tempDir("prop"))
      batches.foreach(lake.ingestBatch)
      (0L to lake.txnLog.currentVersion()).sliding(2).foreach {
        case Seq(a, b) =>
          assert(lake.txnLog.snapshotFiles(a).toSet
            .subsetOf(lake.txnLog.snapshotFiles(b).toSet), s"seed=$seed")
        case _ =>
      }
    }
  }

  // Doubles across the full representable range INCLUDING the ones whose
  // Double.toString renders in scientific notation ("1.0E-7", "1.23E22")
  // — the encoding the FIX parse's numeric guard must admit. Finite
  // only: a feed never quotes NaN/Inf, and the non-finite path is
  // asserted separately below.
  private val genWildDouble: Gen[Double] = for {
    m <- Gen.choose(-9.999999, 9.999999)
    e <- Gen.choose(-30, 30)
  } yield m * math.pow(10, e)

  test("FIX round-trip is exact for wild-but-finite values (property)") {
    import graft.streaming.{FeedReplayServer, Streaming}
    val genBar: Gen[OhlcvBar] = for {
      sym <- Gen.oneOf("AAPL", "X", "BRK.B", "ES=F-2025")
      ms <- Gen.choose(0L, 4102444800000L) // 1970..2100, any millis
      o <- genWildDouble; h <- genWildDouble
      l <- genWildDouble; c <- genWildDouble
      v <- Gen.choose(Long.MinValue, Long.MaxValue)
      ac <- Gen.oneOf(AssetClass.all)
    } yield OhlcvBar(sym, new Timestamp(ms), o, h, l, c, v, ac)
    // parse-level property: round-trip EXACTNESS for whatever the wire
    // carries (validity/DLQ routing is downstream's job, not the
    // parser's) — Double.toString -> cast is bit-exact by Java's
    // shortest-repr contract, and the ms timestamp must survive
    val bars = seeds.flatMap(s =>
      (0 until 10).map(i => sample(genBar, s * 1000 + i)))
    val parsed = Streaming.parseFixLines(
        spark.createDataset(bars.map(FeedReplayServer.fixLine))(
          org.apache.spark.sql.Encoders.STRING).toDF("value"))
      .as[OhlcvBar](org.apache.spark.sql.Encoders.product[OhlcvBar])
      .collect().toSeq
    assert(parsed == bars)
  }

  test("FIX parse nulls non-finite prices; encoder rejects delimiter-carrying values") {
    import graft.streaming.{FeedReplayServer, Streaming}
    val bar = OhlcvBar("SYM1", new Timestamp(1718445600000L),
      Double.NaN, Double.PositiveInfinity, 90.0, 105.0, 5L,
      AssetClass.Equity)
    // NaN/Infinity render as "NaN"/"Infinity" — not FIX-legal numerics;
    // the guard must null those FIELDS (downstream DLQs the row), while
    // fields that are legal still parse
    val row = Streaming.parseFixLines(
      spark.createDataset(Seq(FeedReplayServer.fixLine(bar)))(
        org.apache.spark.sql.Encoders.STRING).toDF("value")).head()
    assert(row.isNullAt(2) && row.isNullAt(3)) // open NaN, high Inf
    assert(row.getDouble(4) == 90.0 && row.getString(0) == "SYM1")
    // SOH inside a value would re-frame the message with a MATCHING
    // checksum — must be rejected at encode time, never sent
    for (bad <- Seq("AB\u0001CD", "AB\nCD")) {
      val e = intercept[IllegalArgumentException] {
        FeedReplayServer.fixLine(bar.copy(symbol = bad))
      }
      assert(e.getMessage.contains("delimiter"))
    }
  }
}
