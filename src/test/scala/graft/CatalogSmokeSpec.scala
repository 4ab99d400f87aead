package graft

/** Every catalog query must execute end-to-end at sf0.001 — a fast
  * regression net over the whole SparkEntry surface (the DuckDB oracle
  * gate checks values; this catches runtime breakage in `sbt test`).
  */
class CatalogSmokeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"catalog query $name runs at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0) // full execution; emptiness is query-specific
    }
  }

  test("entry() returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("testdata drift tripwire: events.ts is an encoding Tables.load handles") {
    // Round-6 postmortem: the driver regenerated /root/testdata mid-round
    // and events.ts silently flipped parquet timestamp[ns] -> timestamp[us],
    // crashing 31 catalog queries. This test reads the RAW footer dtype (no
    // loader normalization) so the NEXT regen diagnoses itself in one line.
    import org.apache.spark.sql.types.{LongType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val raw = spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType
    assert(raw == LongType || raw == TimestampType,
      s"events.ts now reads as $raw — the driver regenerated testdata with a " +
        "NEW timestamp encoding. Extend Tables.load's dtype branch (it handles " +
        "timestamp[ns]->Long via nanosAsLong and timestamp[us]->TimestampType).")
    // And the normalized contract every query depends on:
    val loaded = Tables.load(spark, sfDir, "events")
    assert(loaded.schema("ts_ns").dataType == LongType)
    assert(loaded.schema("ts_us").dataType == LongType)
    assert(loaded.schema("ts").dataType == TimestampType)
  }

  test("q79/q80 survive zero-valued prices (sf0.1 ANSI DIVIDE_BY_ZERO regression)") {
    // Round-5 verdict: sf0.1 has value=0 rows that sf0.01 lacks, so the
    // log-return division crashed ONLY at bench scale while the sf0.01
    // oracle stayed green. Pin the guard against a fixture that contains
    // the hazard: a zero mid-series (q79 lag pairs) and a zero FIRST
    // price (q80 zero running peak).
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("zeroval").toString
    val rows = Seq(
      // user 1: 100 -> 0 -> 110 -> 121 within one day; only the
      // 110->121 pair is a valid log return
      (1L, 1L, 1000000000000L, "view", 100.0, "{}"),
      (2L, 1L, 2000000000000L, "view", 0.0, "{}"),
      (3L, 1L, 3000000000000L, "view", 110.0, "{}"),
      (4L, 1L, 4000000000000L, "view", 121.0, "{}"),
      // user 2: first price zero -> running peak 0 on row 1 (q80 hazard)
      (5L, 2L, 1000000000000L, "view", 0.0, "{}"),
      (6L, 2L, 2000000000000L, "view", 50.0, "{}"),
      (7L, 2L, 3000000000000L, "view", 25.0, "{}"))
    spark.createDataFrame(rows)
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val vol = SparkEntry.queries("q79_realized_vol")(spark, dir).collect()
    // pairs touching the zeros drop; one valid return per user survives:
    // user 1 log(121/110)^2, user 2 log(25/50)^2
    assert(vol.length == 2)
    val byUser = vol.map(r => r.getAs[Long]("user_id") ->
      (r.getAs[Long]("n_returns"), r.getAs[Double]("realized_var"))).toMap
    def expectedVar(a: Double, b: Double): Double = {
      val r2 = math.round(math.pow(math.log(b / a), 2) * 1e8) / 1e8
      math.round(r2 * 1e4) / 1e4.toDouble
    }
    assert(byUser(1L) == ((1L, expectedVar(110.0, 121.0))))
    assert(byUser(2L) == ((1L, expectedVar(50.0, 25.0))))

    val dd = SparkEntry.queries("q80_drawdown")(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("max_drawdown")).toMap
    assert(dd(1L) == 1.0) // price hits 0 from peak 100: a full (100%) drawdown
    assert(dd(2L) == 0.5) // peak 50 -> trough 25; the zero-PEAK row is guarded to 0
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("q42 fingerprints == HOF twin on the full sf0.01 gate corpus") {
    // q42 is rows-only in the oracle gate (xxhash64 has no DuckDB
    // equivalent), so its machine check is a second independent Scala
    // implementation: the interpreted HOF fingerprint must produce the
    // SAME sketch as the codegen'd native expression for every gate doc.
    import org.apache.spark.sql.functions._
    import graft.functions.TextOps
    import spark.implicits._
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val cmp = docs.select(
      TextOps.fingerprint($"text", 8, 16).as("hof"),
      graft.functions.NgramFingerprint.fingerprintFast(spark, $"text", 8, 16)
        .as("fast"))
    assert(cmp.filter(not($"hof" === $"fast")).count() == 0)
  }

  test("q51 winnowing pair set == independent driver-side rebuild at sf0.01") {
    // Same rationale as q42: no SQL oracle exists for xxhash64 winnowing,
    // so rebuild q51's ENTIRE pair pipeline independently — HOF winnow
    // fingerprints (interpreted, not the window form) and driver-side
    // Scala posting lists (no Spark joins) — and require set equality
    // including the shared_fps counts, on the gate corpus itself.
    import org.apache.spark.sql.functions._
    import graft.functions.TextOps
    import spark.implicits._
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val hofFps: Map[Long, Set[Long]] = docs
      .select($"doc_id", TextOps.winnow($"text", 8, 8).as("fp"))
      .as[(Long, Seq[Long])].collect()
      .map { case (id, fp) => id -> fp.toSet }.toMap
    val posting = scala.collection.mutable.HashMap.empty[Long, List[Long]]
    hofFps.foreach { case (id, fps) =>
      fps.foreach(fp => posting(fp) = id :: posting.getOrElse(fp, Nil))
    }
    val shared = scala.collection.mutable.HashMap.empty[(Long, Long), Int]
    posting.values.foreach { ids =>
      // q51's df window [2, 64]: singletons can't pair, hot fps are capped
      if (ids.size > 1 && ids.size <= 64) {
        val s = ids.sorted
        for (i <- s.indices; j <- (i + 1) until s.size)
          shared((s(i), s(j))) = shared.getOrElse((s(i), s(j)), 0) + 1
      }
    }
    val want = shared.collect {
      case (pair, n) if n >= 3 => (pair._1, pair._2, n.toLong)
    }.toSet
    val got = SparkEntry.queries("q51_winnowing")(spark, "/root/testdata/sf0.01")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want,
      s"q51 mismatch: got ${got.size} pairs, independent rebuild ${want.size}")
  }

  test("q49 approx percentiles within the GK rank-error bound of exact (sf0.01)") {
    // q49 is rows-only in the driver gate (sketch results are
    // engine-specific), so its machine check is the sketch's own
    // guarantee: Spark's approx_percentile is a Greenwald-Khanna summary
    // with rank error <= n/accuracy. For each group, the approx p-th
    // value must lie between the EXACT order statistics at ranks
    // floor((p-eps)n) and ceil((p+eps)n), eps = 1/accuracy — a bound
    // that stays valid at any sf, unlike pinning exact equality (which
    // only holds while n < accuracy).
    val approx = SparkEntry.queries("q49_percentiles_approx")(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val byGroup = Tables.load(spark, "/root/testdata/sf0.01", "orders")
      .select("o_orderpriority", "o_totalprice").collect()
      .groupBy(_.getString(0))
      .map { case (g, rs) => g -> rs.map(_.getDouble(1)).sorted }
    assert(approx.keySet == byGroup.keySet)
    val eps = 1.0 / 10000 // the accuracy parameter q49 passes
    for ((g, sorted) <- byGroup; (p, got) <- Seq(0.5 -> approx(g)._1, 0.9 -> approx(g)._2)) {
      val n = sorted.length
      val lo = sorted(math.max(0, math.floor((p - eps) * n).toInt - 1))
      val hi = sorted(math.min(n - 1, math.ceil((p + eps) * n).toInt))
      assert(got >= lo - 1e-4 && got <= hi + 1e-4, // 1e-4 = q49's output rounding
        s"$g p$p: approx $got outside exact rank band [$lo, $hi] (n=$n)")
    }
  }

  test("q39 approx distinct within the HLL++ error bound of exact (sf0.01)") {
    // q39 is rows-only in the driver gate (DuckDB's HLL sketch produces
    // different estimates by design), so its machine check is the
    // sketch's own guarantee: Spark's approx_count_distinct is HLL++
    // with relative standard deviation rsd (q39 passes 0.05). Pin each
    // group's estimate inside 3×rsd of the exact distinct count — the
    // 3-sigma band, valid at any sf. q39 returns BOTH columns, so the
    // spec reads one result; the exact column is what q10's oracle
    // family already verifies.
    val rsd = 0.05 // the accuracy parameter q39 passes
    val rows = SparkEntry.queries("q39_approx_distinct")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val flag = r.getString(0)
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      val relErr = math.abs(approx - exact) / exact
      assert(relErr <= 3 * rsd,
        f"$flag: approx $approx%.0f vs exact $exact%.0f — relative error " +
          f"$relErr%.4f exceeds the 3×rsd=${3 * rsd}%.2f HLL++ band")
    }
  }

  test("q89/q90 collapse correctly on a constant price series") {
    // A flat series has zero variance: the Bollinger bands must collapse
    // onto the SMA with pct_b guarded to 0.5 (no division blow-up), and
    // the truncated-kernel EWMA of a constant must be the constant
    // itself (the integer-scaled weights divide back out exactly).
    import org.apache.spark.sql.functions._
    val dir = tempDir("flatseries")
    val rows = (1 to 15).map(i =>
      (i.toLong, 1L, i * 1000000000000L, "purchase", 25.5, "{}"))
    spark.createDataFrame(rows)
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val boll = SparkEntry.queries("q89_bollinger")(spark, dir).collect()
    assert(boll.length == 6) // 15 rows, full 10-row windows start at row 10
    boll.foreach { r =>
      assert(r.getAs[Double]("sma") == 25.5)
      assert(r.getAs[Double]("upper_band") == 25.5)
      assert(r.getAs[Double]("lower_band") == 25.5)
      assert(r.getAs[Double]("pct_b") == 0.5)
    }
    val ewma = SparkEntry.queries("q90_ewma")(spark, dir).collect()
    assert(ewma.length == 8) // full 8-lag kernels start at row 8
    ewma.foreach(r => assert(r.getAs[Double]("ewma") == 25.5))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("q91 chunk grid == independent Scala substring rebuild") {
    // Chunks must tile the document: stride-offset substrings of size C,
    // last chunk shorter, nothing dropped past the end. Rebuild every
    // (len, md5) from plain Scala string ops and require equality.
    import org.apache.spark.sql.functions._
    val dir = tempDir("chunkfix")
    val texts = Seq(
      1L -> "a" * 48,                      // single short chunk
      2L -> ("abc" * 184),                 // 552 chars -> 4 chunks
      3L -> (1 to 70).map(i => s"w$i").mkString(" "), // irregular length
      4L -> "x" * 200,                     // exactly one full chunk
      5L -> "y" * 350)                     // extra = 150: boundary multiple
    spark.createDataFrame(texts.map { case (id, t) =>
      (id, t, "en", "web", t.length.toLong) })
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    val want = texts.flatMap { case (id, t) =>
      val extra = math.max(t.length - 200, 0)
      val n = 1 + (extra + 149) / 150
      (0 until n).map { i =>
        val chunk = t.drop(i * 150).take(200)
        (id, i.toLong, chunk.length.toLong, md5hex(chunk))
      }
    }.toSet
    import spark.implicits._
    val got = SparkEntry.queries("q91_chunking")(spark, dir)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == want)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("q92 pack assignment == independent Scala cumsum rebuild at sf0.001") {
    // Packing is concat-then-cut per md5-nibble stream: rebuild the
    // assignment with a plain Scala fold (no Spark windows) on the gate
    // corpus and require identical (bucket, pack, n_docs, chars) rows.
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect()
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = docs.toSeq
      .map { case (id, nc) => (md5hex(id.toString), id, nc) }
      .groupBy(_._1.head).toSeq
      .flatMap { case (bucket, ds) =>
        var cum = 0L
        ds.sortBy(d => (d._1, d._2)).map { case (_, id, nc) =>
          cum += nc
          (bucket.toString, (cum - nc) / 2000, id, nc)
        }
      }
      .groupBy(p => (p._1, p._2))
      .map { case ((b, p), xs) =>
        (b, p, xs.size.toLong, xs.map(_._4).sum)
      }.toSet
    val got = SparkEntry.queries("q92_packing")(spark, sfDir)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("pair-set memo is scoped to one dir: switching dirs releases the persist") {
    // VERDICT r4 #5: a multi-dir catalog sweep must not accumulate every
    // dir's persisted pair sets in executor storage
    import org.apache.spark.storage.StorageLevel
    val a = queries.DedupQueries.neardupPairs(spark, sfDir)
    a.count() // materialize the persist
    assert(a.storageLevel != StorageLevel.NONE)
    val b = queries.DedupQueries.neardupPairs(spark, "/root/testdata/sf0.01")
    assert(a.storageLevel == StorageLevel.NONE) // old dir released
    b.count()
    assert(b.storageLevel != StorageLevel.NONE)
    // touch the original dir again so suites running after this one see
    // a consistent memo state (it simply rebuilds)
    queries.DedupQueries.neardupPairs(spark, sfDir).count()
  }

  test("catalog ANN recall@10 floors vs the brute q25 answer (sf0.01)") {
    // VERDICT r16 #4: the four ANN queries are rows-only in the driver
    // gate (seeded buckets/cells — no portable oracle), so a silent
    // recall regression would pass it. Verify emits the measured
    // recall@10 into its artifact (recall.json); this floors the SAME
    // computation over the catalog entries' own geometries. Floors sit
    // at or below the measured values (lsh 0.9 / ivf 0.9 / pq 1.0 /
    // ivfpq 0.8 on this data) so only an algorithm or geometry change
    // trips them.
    val dir = "/root/testdata/sf0.01"
    import spark.implicits._
    def topIds(name: String): Set[Long] = {
      val df = SparkEntry.queries(name)(spark, dir)
      df.select(df.columns.head).as[Long].collect().toSet
    }
    val brute = topIds("q25_cosine_topk")
    assert(brute.size == 10)
    val floors = Seq("q29_ann_lsh" -> 0.7, "q50_ann_ivf" -> 0.9,
      "q65_ann_pq" -> 0.9, "q66_ann_ivfpq" -> 0.7)
    floors.foreach { case (name, floor) =>
      val recall = (topIds(name) & brute).size / 10.0
      info(f"$name recall@10 = $recall%.1f (floor $floor%.1f)")
      assert(recall >= floor,
        f"$name recall@10 $recall%.1f under floor $floor%.1f")
    }
  }
}
