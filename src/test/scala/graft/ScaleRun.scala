package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-evidence harness (test scope, run by hand):
  *
  *   sbt "Test/runMain graft.ScaleRun [simhash|minhash] [mult]"
  *
  * Builds a `mult`× corpus (default 10×) from sf0.1 documents by unioning
  * id-shifted copies — every doc gains mult−1 identical clones, which is
  * the bucket-stress WORST case for both LSH families (identical docs
  * share every band/chunk bucket) — then times the near-dup pipeline on
  * local[32]. Results are recorded in NOTES.md "Scale evidence".
  */
object ScaleRun {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("simhash")
    val mult = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      // 32 matches Bench; rungs whose shuffles carry billions of rows
      // (e.g. the past-headroom minhash degrade) override it the way a
      // real cluster would — partitions sized so a partition's sort/agg
      // state fits task memory
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // Full-catalog scale corpus (VERDICT r9 #3): writes a mult× copy of
    // EVERY sf0.1 table to args(2) (default /tmp/scale_catalog) so the
    // whole 100-query Bench can run above sf0.1 via SPARK_GRAFT_SF_DIR.
    // Shard construction preserves per-shard structure exactly and
    // fabricates nothing across shards — the crawl-growth shape (10×
    // data, same duplication density), so per-query scale exponents
    // measure operator cost, not answer-size artifacts:
    //  - fact/dim keys shift by shard×1e9 (joins stay within-shard;
    //    fan-outs and group sizes per key unchanged);
    //  - nation/region stay single-copy (grouping cardinality and
    //    broadcast-side size are invariants of the schema, not of sf);
    //  - document text gets a per-shard Caesar substitution (bijective
    //    on characters: token/shingle structure, lengths, n_chars, and
    //    within-shard Jaccard all exactly preserved; cross-shard n-gram
    //    overlap destroyed, so the true near-dup pair set is mult× the
    //    base — same rationale as bigShifted below);
    //  - embeddings rotate cyclically by shard (orthogonal transform:
    //    within-shard cosine geometry exact, cross-shard pairs
    //    decorrelated);
    //  - event timestamps keep their range: 10× density per time
    //    window, the busier-feed shape windowed aggs see at scale.
    if (which == "catalog") {
      require(mult >= 2 && mult <= 26,
        s"caesar shards alias beyond 26x: $mult")
      val out = args.lift(2).getOrElse("/tmp/scale_catalog")
      val OFF = 1000000000L
      val alpha = "abcdefghijklmnopqrstuvwxyz"
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      def write(name: String)(f: (org.apache.spark.sql.DataFrame, Int) => org.apache.spark.sql.DataFrame): Unit = {
        val src = spark.read.parquet(s"/root/testdata/sf0.1/$name.parquet")
        val copies = (0 until mult).map(i => f(src, i))
        copies.reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$out/$name.parquet")
        println(s"[gen] $name rows=" +
          spark.read.parquet(s"$out/$name.parquet").count())
      }
      def shifted(cols: String*)(d: org.apache.spark.sql.DataFrame, i: Int) =
        cols.foldLeft(d)((df, c) => df.withColumn(c, col(c) + lit(i * OFF)))
      write("region")((d, i) => if (i == 0) d else d.limit(0))
      write("nation")((d, i) => if (i == 0) d else d.limit(0))
      write("customer")(shifted("c_custkey"))
      write("supplier")(shifted("s_suppkey"))
      write("part")(shifted("p_partkey"))
      write("orders")(shifted("o_orderkey", "o_custkey"))
      write("lineitem")(shifted("l_orderkey", "l_partkey", "l_suppkey"))
      // cast ts NTZ→LTZ before writing (value-identical under the UTC
      // session): the base file's isAdjustedToUTC=false footer reads as
      // NTZ here (inferTimestampNTZ default), and writing that through
      // pins TimestampNTZType in Spark row metadata — which would force
      // Tables.load onto its cast branch (no ts pushdown) for the whole
      // sweep corpus.
      write("events")((d, i) =>
        shifted("event_id", "user_id")(d, i)
          .withColumn("ts", col("ts").cast("timestamp")))
      write("documents") { (d, i) =>
        val rot = alpha.drop(i % 26) + alpha.take(i % 26)
        shifted("doc_id")(d, i).withColumn("text",
          translate(col("text"), alpha + alpha.toUpperCase,
            rot + rot.toUpperCase))
      }
      write("embeddings") { (d, i) =>
        val r = shifted("vec_id")(d, i)
        if (i == 0) r
        else r.withColumn("embedding", expr(
          s"concat(slice(embedding, ${i + 1}, size(embedding)), " +
            s"slice(embedding, 1, $i))"))
      }
      spark.stop(); return
    }

    // Multi-writer txn-log CONTENTION rung (VERDICT r16 #2):
    // TxnCrossProcessSpec proves 2-JVM safety; this measures THROUGHPUT
    // under sustained contention — `workers` forked JVMs (default 4) ×
    // `commits` blind appends each (default 250) against ONE log root,
    // rendezvous'd so the window is fully contended. Claims: aggregate
    // wall stays near-linear in total commits (the exclusive-create race
    // costs retries, not collapse) and per-commit retries stay bounded
    // (no starved writer). Pure file IO — no Spark jobs.
    if (which == "txncontend") {
      val workers = args.lift(1).map(_.toInt).getOrElse(4)
      val commits = args.lift(2).map(_.toInt).getOrElse(250)
      import java.nio.file.{Files, Paths}
      val javaBin = Paths
        .get(sys.props("java.home"), "bin", "java").toString
      def fork(root: String, tag: String): Process = {
        val pb = new ProcessBuilder(javaBin, "-cp",
          sys.props("java.class.path"), "graft.TxnContendMain",
          root, commits.toString, tag)
        pb.redirectErrorStream(true)
        pb.redirectOutput(ProcessBuilder.Redirect.INHERIT)
        pb.start()
      }
      // baseline: ONE writer, same commit count, uncontended
      val soloRoot = Files.createTempDirectory("txncontend-solo").toString
      val solo = fork(soloRoot, "solo")
      Files.createFile(Paths.get(soloRoot, "go"))
      require(solo.waitFor(300, java.util.concurrent.TimeUnit.SECONDS) &&
        solo.exitValue() == 0, "solo worker failed")
      val soloWall = new String(Files.readAllBytes(
        Paths.get(soloRoot, "contend-solo"))).split(" ")(0).toDouble
      // contended: `workers` JVMs over one root, released together
      val root = Files.createTempDirectory("txncontend").toString
      val tags = (0 until workers).map(i => s"w$i")
      val procs = tags.map(t => t -> fork(root, t))
      val deadline = System.currentTimeMillis() + 60000
      while (tags.exists(t => !Files.exists(Paths.get(root, s"ready-$t"))) &&
        System.currentTimeMillis() < deadline) Thread.sleep(5)
      Files.createFile(Paths.get(root, "go"))
      procs.foreach { case (t, p) =>
        require(p.waitFor(600, java.util.concurrent.TimeUnit.SECONDS),
          s"worker $t hung")
        require(p.exitValue() == 0, s"worker $t crashed")
      }
      val stats = tags.map { t =>
        val Array(wall, retries, maxPer) = new String(Files.readAllBytes(
          Paths.get(root, s"contend-$t"))).split(" ")
        (t, wall.toDouble, retries.toLong, maxPer.toLong)
      }
      val total = workers * commits
      val wallMax = stats.map(_._2).max
      val retriesTotal = stats.map(_._3).sum
      val maxPerCommit = stats.map(_._4).max
      stats.foreach { case (t, w, r, m) =>
        println(f"[scale] txncontend worker=$t wallMs=$w%.0f retries=$r maxRetriesPerCommit=$m")
      }
      println(f"[scale] txncontend workers=$workers commitsEach=$commits " +
        f"total=$total soloWallMs=$soloWall%.0f contendedWallMs=$wallMax%.0f " +
        f"throughputSolo=${commits / (soloWall / 1000)}%.0f/s " +
        f"throughputContended=${total / (wallMax / 1000)}%.0f/s " +
        f"retriesTotal=$retriesTotal retriesPerCommit=${retriesTotal.toDouble / total}%.2f " +
        f"maxRetriesPerCommit=$maxPerCommit")
      // correctness under contention: contiguous versions, no lost or
      // duplicated append, from a fresh reader process-equivalent
      val reader = new graft.sources.TxnLog(root)
      assert(reader.currentVersion() == total - 1L,
        s"version head ${reader.currentVersion()} != ${total - 1}")
      val live = reader.snapshotFiles().toSet
      tags.foreach { t =>
        (0 until commits).foreach { i =>
          assert(live.contains(s"$t-$i.parquet"), s"lost $t-$i") }
      }
      // near-linear: aggregate throughput under 4-way contention stays
      // within 4x of the solo writer's (publishes serialize on the FS;
      // the bound trips only on a retry storm / starvation collapse)
      assert(wallMax < (soloWall * workers) * 4,
        f"contention collapse: $wallMax%.0f ms for $total commits vs " +
          f"solo $soloWall%.0f ms for $commits")
      // bounded retries: no commit came near the 100-attempt cap
      assert(maxPerCommit <= 50,
        s"a commit retried $maxPerCommit times — starvation risk")
      spark.stop(); return
    }

    // Skewed-join rung (VERDICT r16 #7): a q05-shaped fact⋈dim join at
    // mult× sf0.1 lineitem where ONE key owns ~30% of the fact rows.
    // Compares plain shuffle join (AQE skew mitigation OFF), plain with
    // AQE skew mitigation ON, and Skew.saltedJoin — wall plus the
    // max/median task-time spread (the straggler signature). Broadcast
    // is disabled: the salted join's documented regime is "small side
    // too big to broadcast, big side skewed".
    if (which == "skewjoin") {
      val sqlf = org.apache.spark.sql.functions
      val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        .select($"l_orderkey", $"l_extendedprice")
      val big0 = (0 until mult).map(i =>
        li.withColumn("l_orderkey", $"l_orderkey" + lit(i * 1000000000L)))
        .reduce(_ unionAll _)
      // bounded key domain (the dim side must be SMALL relative to the
      // fact — the salted regime — just not broadcastable here), with
      // ~30% of fact rows collapsed onto one hot key
      val keyDomain = 100000L
      val big = big0.withColumn("l_orderkey",
        sqlf.when(sqlf.pmod(sqlf.xxhash64($"l_orderkey",
          $"l_extendedprice"), lit(10)) < 3, lit(42L))
          .otherwise(sqlf.pmod(sqlf.xxhash64($"l_orderkey"),
            lit(keyDomain)))).persist()
      val nBig = big.count()
      val dim = big.select($"l_orderkey".as("o_orderkey")).distinct()
        .withColumn("o_flag", sqlf.pmod($"o_orderkey", lit(7)))
        .persist()
      val nDim = dim.count()
      println(s"[scale] skewjoin rows=$nBig dimRows=$nDim (hot key ~30%)")
      // per-stage task durations: the skew signature is the max/median
      // spread WITHIN the reducer stage — whole-job medians are
      // dominated by the map-side scan tasks and mask it
      val durations =
        new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            durations.add((te.stageId, te.taskInfo.duration))
        })
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      def run(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
        durations.clear()
        val t0 = System.nanoTime()
        val n = f.groupBy().agg(sqlf.sum($"l_extendedprice")).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500) // listener bus drain (async)
        import scala.jdk.CollectionConverters._
        // report the stage holding the longest task (the hot reducer's)
        val byStage = durations.asScala.toSeq.groupBy(_._1)
        val (stage, ds0) = byStage.maxBy(_._2.map(_._2).max)
        val ds = ds0.map(_._2).sorted
        val med = math.max(1L, ds(ds.size / 2))
        println(f"[scale] skewjoin $tag rows=$n wall=$wall%.1f " +
          f"hotStage=$stage tasks=${ds.size} maxTaskMs=${ds.last} " +
          f"medianTaskMs=$med spread=${ds.last.toDouble / med}%.1f")
      }
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      run("plain-noAqeSkew")(big.join(dim, $"l_orderkey" === $"o_orderkey"))
      run("salted")(operators.Skew.saltedJoin(big, dim,
        "l_orderkey", "o_orderkey", salts = 32))
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      run("plain-aqeSkew")(big.join(dim, $"l_orderkey" === $"o_orderkey"))
      spark.stop(); return
    }

    // Txn-log metadata scale probe: mult×1000 commits in the streaming
    // ring pattern (each commit adds one file, retires the previous —
    // live set stays 1, the 100 ms-cadence shape from README.md:37).
    // The 100-TB metadata claims under test: commit latency is FLAT in
    // commit count (O(1) warm commits: one forward existence probe + one
    // exclusive-create, plus an O(live) checkpoint every interval);
    // snapshot/schema resolution is checkpoint-seeded (O(interval +
    // live), flat in commit count, warm AND from a cold process); and
    // windowed reads (table_changes pollers, incremental-view refresh)
    // pay O(window), never O(log). No Spark jobs — this is pure log IO.
    // Durable dedup-index compaction scale probe (the r15 fold
    // protocol): an incremental dedup stream leaves one append partition
    // per table per micro-batch. Claims under test: probe cost over a
    // many-append index degrades only through listing/scan width (small
    // files), compactMinhashIndex is one bounded pass whose output
    // leaves exactly (folded base + newest append) partitions per
    // table, the probe pair set is IDENTICAL across the fold, and the
    // post-fold probe is at-or-below the pre-fold cost.
    if (which == "dedupindex") {
      val nAppends = mult * 10
      val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
        .persist()
      val probe = docs.filter($"doc_id" % 997 < 60)
      val idxPath = java.nio.file.Files
        .createTempDirectory("dedupidx-scale").toString
      def slice(k: Int) = docs.filter($"doc_id" % (nAppends + 1) === k)
      operators.Dedup.saveMinhashIndex(
        operators.Dedup.minhashIndex(slice(0), "doc_id", "text"), idxPath)
      val tIng0 = System.nanoTime()
      (1 to nAppends).foreach { k =>
        operators.Dedup.appendToMinhashIndex(idxPath, slice(k),
          "doc_id", "text", s"b$k")
      }
      val ingestMs = (System.nanoTime() - tIng0) / 1e6
      def timedProbe(): (Double, Set[(Long, Long)]) = {
        val t0 = System.nanoTime()
        val idx = operators.Dedup.loadMinhashIndex(spark, idxPath)
        val got =
          try operators.Dedup.minhashPairsAgainstIndex(probe, idx,
              "doc_id", "text", threshold = 0.2)
            .select($"batch_id", $"corpus_id")
            .as[(Long, Long)].collect().toSet
          finally idx.unpersist()
        ((System.nanoTime() - t0) / 1e6, got)
      }
      val (preMs, preSet) = timedProbe()
      val tC0 = System.nanoTime()
      val folded = operators.Dedup.compactMinhashIndex(spark, idxPath)
      val compactMs = (System.nanoTime() - tC0) / 1e6
      assert(folded == nAppends, s"folded $folded, want $nAppends")
      val (postMs, postSet) = timedProbe()
      assert(postSet == preSet, "probe pair set changed across the fold")
      val parts = new java.io.File(s"$idxPath/bands").listFiles()
        .map(_.getName).count(_.startsWith("append="))
      println(f"[dedupindex] appends=$nAppends ingest=${ingestMs / 1000}%.2fs " +
        f"probe_pre=${preMs / 1000}%.2fs compact=${compactMs / 1000}%.2fs " +
        f"probe_post=${postMs / 1000}%.2fs pairs=${preSet.size} " +
        f"band_partitions_on_disk=$parts")
      docs.unpersist()
      spark.stop(); return
    }

    // Quote-state protocol scale probe (the r14 compaction rewrite):
    // state with mult×100 batch partitions × 50 symbols — the
    // long-running-enrichment shape compaction exists for. Claims under
    // test: enrich (batch AsOfJoin against the state) degrades with
    // partition count only through listing/scan width, compaction is one
    // bounded job whose output is exactly one row per symbol, and enrich
    // over the compacted state is strictly cheaper. Uses ONE partitioned
    // write to build the state (the per-batch reduction invariant — one
    // row per (batch, symbol) — holds by construction).
    if (which == "quotestate") {
      import org.apache.spark.sql.functions.{concat, lit, timestamp_micros}
      val nBatches = mult * 100
      val nSymbols = 50
      val stateDir = java.nio.file.Files
        .createTempDirectory("qstate-scale").toString
      val baseUs = 1718445600000000L
      spark.range(nBatches.toLong * nSymbols).select(
          concat(lit("S"), $"id" % nSymbols).as("qsymbol"),
          timestamp_micros(lit(baseUs) + $"id" * 1000000L).as("qts"),
          $"id".as("qid"),
          ($"id" % 97).cast("double").as("bid"),
          ($"id" % 97 + 1).cast("double").as("ask"),
          concat(lit("b"), ($"id" / nSymbols).cast("long")).as("append"))
        .write.mode("overwrite").partitionBy("append").parquet(stateDir)
      // the bulk partitionBy write leaves one _SUCCESS at the ROOT; the
      // protocol's committed-ness is PER-PARTITION (streaming writers
      // stamp each batch dir) — stamp the synthetic dirs the same way
      new java.io.File(stateDir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("append="))
        .foreach { d =>
          java.nio.file.Files.write(
            d.toPath.resolve(graft.streaming.Streaming.QuoteCommitMarker),
            Array.emptyByteArray)
        }
      val trades = spark.range(100000).select(
        $"id".as("trade_id"),
        concat(lit("S"), $"id" % nSymbols).as("symbol"),
        timestamp_micros(lit(baseUs) + lit(nBatches.toLong * nSymbols * 1000000L)).as("ts"),
        ($"id" % 101).cast("double").as("price"))
      def timeEnrich(tag: String): Double = {
        val out = java.nio.file.Files
          .createTempDirectory(s"qenrich-$tag").toString
        val t0 = System.nanoTime()
        graft.streaming.Streaming.processEnrichBatch(trades, 0L, stateDir, out)
        val ms = (System.nanoTime() - t0) / 1e6
        val got = spark.read.parquet(s"$out/batch=0")
        assert(got.count() == 100000)
        assert(got.filter($"qid".isNull).count() == 0, "unenriched trades")
        ms
      }
      val pre = timeEnrich("pre")
      val t0 = System.nanoTime()
      val kept = graft.streaming.Streaming.compactQuoteState(spark, stateDir)
      val compactMs = (System.nanoTime() - t0) / 1e6
      assert(kept == nSymbols, s"kept $kept, want $nSymbols")
      val parts = graft.streaming.Streaming.liveQuotePartitions(stateDir).size
      assert(parts == 1, s"$parts live partitions after compaction")
      val post = timeEnrich("post")
      println(f"[quotestate] batches=$nBatches symbols=$nSymbols " +
        f"enrich_pre=${pre / 1000}%.2fs compact=${compactMs / 1000}%.2fs " +
        f"enrich_post=${post / 1000}%.2fs")
      spark.stop(); return
    }

    if (which == "txnlog") {
      import java.nio.file.Files
      val root = Files.createTempDirectory("txnscale").toString
      val log = new sources.TxnLog(root)
      val n = mult * 1000
      def medianMs(xs: Seq[Double]): Double = {
        val s = xs.sorted; s(s.length / 2)
      }
      val window = 500
      val lat = new Array[Double](n)
      val warmSnap = scala.collection.mutable.ArrayBuffer[(Int, Double, Double)]()
      val stat = sources.TxnLog.FileStat("AAPL", "ZZZZ", 0L, 1000000L)
      (0 until n).foreach { i =>
        val t0 = System.nanoTime()
        log.commit(
          added = Seq(f"date=2024-06-15/part-$i%08d.parquet"),
          removed = if (i == 0) Nil
            else Seq(f"date=2024-06-15/part-${i - 1}%08d.parquet"),
          rowCounts = Map(f"date=2024-06-15/part-$i%08d.parquet" -> 100L),
          fileStats = Map(f"date=2024-06-15/part-$i%08d.parquet" -> stat))
        lat(i) = (System.nanoTime() - t0) / 1e6
        if ((i + 1) % (n / 4) == 0) {
          val t1 = System.nanoTime()
          val files = log.snapshotFiles()
          val snapMs = (System.nanoTime() - t1) / 1e6
          val t2 = System.nanoTime()
          log.schemaAt()
          val schemaMs = (System.nanoTime() - t2) / 1e6
          assert(files.size == 1, s"ring live set drifted: ${files.size}")
          warmSnap += ((i + 1, snapMs, schemaMs))
        }
      }
      val first = medianMs(lat.slice(0, window).toSeq)
      val mid = medianMs(lat.slice(n / 2 - window / 2, n / 2 + window / 2).toSeq)
      val last = medianMs(lat.slice(n - window, n).toSeq)
      println(f"[scale] txnlog commits=$n commitMedianMs " +
        f"first=$first%.2f mid=$mid%.2f last=$last%.2f")
      warmSnap.foreach { case (at, s, sc) =>
        println(f"[scale] txnlog warm@$at snapshotMs=$s%.1f schemaMs=$sc%.1f") }
      // cold process: fresh instance, empty caches — the planner-restart
      // case. Snapshot must seed from the newest checkpoint (tail <=
      // interval), never replay the log.
      val cold = new sources.TxnLog(root)
      val t3 = System.nanoTime()
      val coldFiles = cold.snapshotFiles()
      val coldSnapMs = (System.nanoTime() - t3) / 1e6
      val t4 = System.nanoTime()
      val tail = cold.commitsBetween(n - 11L, n - 1L)
      val coldWindowMs = (System.nanoTime() - t4) / 1e6
      // the O(log) comparators: a full replay and a full history read
      val cold2 = new sources.TxnLog(root)
      val t5 = System.nanoTime()
      val all = cold2.commits()
      val fullReplayMs = (System.nanoTime() - t5) / 1e6
      println(f"[scale] txnlog cold snapshotMs=$coldSnapMs%.1f " +
        f"window10Ms=$coldWindowMs%.1f fullReplayMs=$fullReplayMs%.1f " +
        f"(files=${coldFiles.size} window=${tail.size} commits=${all.size})")
      // vacuum tombstone resolution: checkpoint-seeded like the snapshot
      // (the ring removed n−1 files, the worst rewrite-heavy shape)
      val t6 = System.nanoTime()
      val tombs = cold.removedTombstones()
      val tombMs = (System.nanoTime() - t6) / 1e6
      // tombstone-state bound: the ring removed n−1 files, all within
      // the 30-day horizon — before a vacuum record the sidecar CHAIN
      // carries them all (in O(interval) delta writes + geometric
      // rebases); after one completed vacuum the next checkpoint rebases
      // to only the post-vacuum tail, dropping the superseded chain
      val preTrimBytes = cold.tombsFootprintBytes()
      Thread.sleep(5)
      cold.recordVacuumCutoff(System.currentTimeMillis())
      (0 until 20).foreach { i =>
        cold.commit(added = Seq(f"post-$i.parquet"),
          removed = Seq(if (i == 0) f"date=2024-06-15/part-${n - 1}%08d.parquet"
            else f"post-${i - 1}.parquet"))
      }
      val postTrimBytes = cold.tombsFootprintBytes()
      println(f"[scale] txnlog tombstonesMs=$tombMs%.1f " +
        f"entries=${tombs.size} tombsChainBytes preVacuum=$preTrimBytes " +
        f"postVacuum=$postTrimBytes")
      assert(tombMs <= fullReplayMs / 5,
        f"tombstone resolution not checkpoint-seeded: $tombMs%.1f vs $fullReplayMs%.1f")
      assert(postTrimBytes < preTrimBytes / 2,
        s"vacuum record did not bound checkpoint size: $preTrimBytes -> $postTrimBytes")
      // flat-or-log assertions (medians defend against scheduler noise)
      assert(last <= math.max(3 * first, first + 2.0),
        f"commit latency grew with log length: first=$first%.2f last=$last%.2f")
      assert(coldSnapMs <= fullReplayMs / 5,
        f"cold snapshot not checkpoint-seeded: $coldSnapMs%.1f vs full replay $fullReplayMs%.1f")
      assert(coldWindowMs <= fullReplayMs / 5,
        f"windowed read not O(window): $coldWindowMs%.1f vs full replay $fullReplayMs%.1f")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      spark.stop(); return
    }

    // 100k-LIVE-FILE checkpoint probe (r10 NOTES candidate #2): per-file
    // (symbol, ts) stats ride the MAIN checkpoint, so every cold snapshot
    // parse pays O(live files) JSON. The ring probe above holds live = 1;
    // this one GROWS the live set (bulk-load shape: 1000 adds/commit,
    // stats per file) and measures what actually binds at scale — cold
    // snapshotFiles latency, checkpoint byte size, and the checkpoint-
    // boundary commit pause — at mult×10k live files. Run at mult 1/5/10
    // for the curve; the sidecar pattern applies to the stats map iff
    // cold resolution degrades materially.
    if (which == "txnlive") {
      import java.nio.file.Files
      import scala.jdk.CollectionConverters._
      val root = Files.createTempDirectory("txnlive").toString
      val log = new sources.TxnLog(root)
      val live = mult * 10000
      val perCommit = 1000
      val lat = scala.collection.mutable.ArrayBuffer.empty[Double]
      (0 until live / perCommit).foreach { c =>
        val rels = (0 until perCommit)
          .map(i => f"date=2024-06-15/part-${c * perCommit + i}%08d.parquet")
        val t0 = System.nanoTime()
        log.commit(added = rels,
          rowCounts = rels.map(_ -> 100L).toMap,
          fileStats = rels.map(_ ->
            sources.TxnLog.FileStat("AAPL", "ZZZZ", 0L, 1000000L)).toMap)
        lat += (System.nanoTime() - t0) / 1e6
      }
      val ckptBytes = Files.list(java.nio.file.Paths.get(root, "_txn_log"))
        .iterator().asScala
        .filter(_.getFileName.toString.startsWith("checkpoint-v"))
        .map(Files.size(_)).maxOption.getOrElse(0L)
      val cold = new sources.TxnLog(root)
      val t1 = System.nanoTime()
      val files = cold.snapshotFiles()
      val coldSnapMs = (System.nanoTime() - t1) / 1e6
      val t2 = System.nanoTime()
      cold.snapshotFiles() // warm: parsed-checkpoint cache hit
      val warmSnapMs = (System.nanoTime() - t2) / 1e6
      assert(files.size == live, s"live drifted: ${files.size}")
      val s = lat.sorted
      println(f"[scale] txnlive live=$live ckptBytes=$ckptBytes " +
        f"coldSnapshotMs=$coldSnapMs%.1f warmSnapshotMs=$warmSnapMs%.1f " +
        f"commitMedianMs=${s(s.size / 2)}%.1f commitMaxMs=${s.last}%.1f")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      spark.stop(); return
    }

    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select($"doc_id", $"text")
    val big = (0 until mult)
      .map(i => docs.select(($"doc_id" + lit(i * 1000000L)).as("doc_id"), $"text"))
      .reduce(_ unionAll _)
      .persist()
    val n = big.count()

    // embedding corpus for the vector cases, cloned the same way (every
    // vector gains mult−1 exact clones: worst-case bucket stress — clones
    // share every table's bucket)
    lazy val bigEmb = {
      val emb = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
        .select($"vec_id", $"embedding")
      (0 until mult)
        .map(i => emb.select(($"vec_id" + lit(i * 1000000L)).as("vec_id"),
          $"embedding"))
        .reduce(_ unionAll _)
        .persist()
    }

    if (which == "lshpairs") bigEmb.count() // materialize outside the timer

    // Shifted-copy corpus for the EXACT pair operators (winnowing /
    // prefix join): identical clones would grow the TRUE pair set
    // quadratically per clone group (every clone pair is a real
    // near-dup), so a clone-stressed wall measures answer-size growth,
    // not operator throughput. A per-copy Caesar substitution rewrites
    // every shingle and fingerprint, making copies disjoint sub-corpora:
    // the true pair set is mult× the original's — the realistic
    // crawl-growth shape (more data, proportional duplication) — and the
    // wall curve isolates the operator. (The capped LSH families keep
    // the clone-stressed corpus: their caps bound the bucket blow-up by
    // design, and stressing them IS the point there.)
    lazy val bigShifted = {
      val alpha = "abcdefghijklmnopqrstuvwxyz"
      (0 until mult).map { i =>
        val rot = alpha.drop(i % 26) + alpha.take(i % 26)
        docs.select(($"doc_id" + lit(i * 1000000L)).as("doc_id"),
          translate(lower($"text"), alpha, rot).as("text"))
      }.reduce(_ unionAll _).persist()
    }
    if (which == "winnowpairs" || which == "ppjoin") {
      // beyond 26 copies the Caesar shifts repeat (i % 26) and copies
      // alias — the pair set silently stops being mult× the base
      require(mult <= 26, s"shifted-copy corpus aliases beyond 26x: $mult")
      bigShifted.count() // materialize outside the timer
    }

    // Storage-layer scale case: mult×2M synthesized bars through the FULL
    // lakehouse path — DataFrame-native append (validate, cluster, zstd
    // parquet, txn commit with per-file stats), range compaction, then a
    // log-stats-pruned symbol+day query. Reports per-phase seconds and
    // the scan-accounting proof that pruning held at scale.
    if (which == "lake") {
      import java.nio.file.Files
      val rows = mult * 2000000L
      val root = Files.createTempDirectory("scalelake").toString
      val lake = new sources.DataLakehouse(spark, root)
      val cents = pmod(col("id") * 37L, lit(100)).cast("double") / 100.0
      val dfBig = spark.range(rows).select(
        concat(lit("SYM"), pmod(col("id"), lit(100))).as("symbol"),
        timestamp_millis(lit(1718409600000L) +
          pmod(col("id"), lit(10)) * 86400000L +
          (col("id") / 10).cast("long")).as("timestamp"),
        (lit(100.0) + pmod(col("id"), lit(50)) + cents).as("open"),
        (lit(160.0) + pmod(col("id"), lit(50)) + cents).as("high"),
        (lit(90.0) + pmod(col("id"), lit(50)) + cents).as("low"),
        (lit(120.0) + pmod(col("id"), lit(50)) + cents).as("close"),
        (lit(1000L) + col("id")).as("volume"),
        lit("equity").as("asset_class"))
      val tA = System.nanoTime()
      lake.appendDF(dfBig)
      val appendS = (System.nanoTime() - tA) / 1e9
      val tC = System.nanoTime()
      lake.compact(maxFilesPerPartition = 0, targetFiles = 16)
      val compactS = (System.nanoTime() - tC) / 1e9
      val tQ = System.nanoTime()
      val qr = lake.query(symbol = Some("SYM42"),
        start = Some(new java.sql.Timestamp(1718496000000L)),
        end = Some(new java.sql.Timestamp(1718582399000L)))
      qr.df.write.format("noop").mode("overwrite").save()
      val queryS = (System.nanoTime() - tQ) / 1e9
      // column DDL must be O(commits), never O(rows): metadata-only
      // commits on the full-size table, timed with a post-DDL pruned
      // read proving the evolved schema serves immediately
      val tD = System.nanoTime()
      lake.addColumn("venue", org.apache.spark.sql.types.StringType)
      val addColS = (System.nanoTime() - tD) / 1e9
      val qr2 = lake.query(symbol = Some("SYM42"),
        start = Some(new java.sql.Timestamp(1718496000000L)),
        end = Some(new java.sql.Timestamp(1718582399000L)))
      assert(qr2.df.columns.contains("venue"))
      // EXECUTE the evolved-schema read (schema resolution alone would
      // not catch a read-path regression against the old files)
      qr2.df.write.format("noop").mode("overwrite").save()
      val tD2 = System.nanoTime()
      lake.dropColumn("venue")
      val dropColS = (System.nanoTime() - tD2) / 1e9
      println(f"[scale] lake ${mult}x rows=$rows append=$appendS%.1f " +
        f"compact=$compactS%.1f prunedQuery=$queryS%.2f " +
        f"rowsScanned=${qr.totalRowsScanned} (of $rows) " +
        f"addColumn=$addColS%.3f dropColumn=$dropColS%.3f")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      spark.stop(); return
    }

    // Ingest-throughput curve (VERDICT r9 #5, vs the reference's
    // headline 10.2 M events/s aggregate / 2.5 M per core,
    // README.md:25,89-91). Three legs, worst-to-best cost shape:
    //  - `ingestBatch`: the driver-side Seq[OhlcvBar] path (the
    //    reference's own single-process ingest shape) — O(driver), the
    //    honest twin of its benchmark;
    //  - `ingestStream`: the FULL streaming path (file source →
    //    validate → 1M-event ring admission → DLQ split (0.1% planted
    //    invalid rows) → per-micro-batch txn commit) at growing totals,
    //    so the curve separates stream startup (fixed) from per-event
    //    cost (asymptote);
    //  - `appendDF`: the distributed scale path (validate, cluster,
    //    zstd, stats, one commit) — what a 1000-executor cluster runs.
    if (which == "ingestcurve") {
      import java.nio.file.Files
      def bars(rows: Long, invalidEvery: Long = 0L) = {
        val cents = pmod(col("id") * 37L, lit(100)).cast("double") / 100.0
        val base = lit(100.0) + pmod(col("id"), lit(50)) + cents
        val bad = invalidEvery > 0L
        spark.range(rows).select(
          concat(lit("SYM"), pmod(col("id"), lit(100))).as("symbol"),
          timestamp_millis(lit(1718409600000L) +
            pmod(col("id"), lit(10)) * 86400000L +
            (col("id") / 10).cast("long")).as("timestamp"),
          base.as("open"),
          // planted DLQ rows: every `invalidEvery`-th bar has high < low
          (if (bad) when(pmod(col("id"), lit(invalidEvery)) === 0,
            base - 20.0).otherwise(base + 60.0) else base + 60.0).as("high"),
          (base - 10.0).as("low"),
          (base + 20.0).as("close"),
          (lit(1000L) + col("id")).as("volume"),
          lit("equity").as("asset_class"))
      }
      // streaming leg: growing totals, ~25k-row source files, several
      // micro-batches per run (admission 16 files/trigger, ring cap 1M)
      Seq(125000L, 500000L, 2000000L).foreach { rows =>
        val root = Files.createTempDirectory("ingcurve").toString
        val src = Files.createTempDirectory("ingsrc").toString
        val ckpt = Files.createTempDirectory("ingckpt").toString
        val filesN = math.max(5L, rows / 25000L).toInt
        bars(rows, invalidEvery = 1000L)
          .repartition(filesN).write.mode("overwrite").parquet(src)
        val lake = new sources.DataLakehouse(spark, root)
        val t0 = System.nanoTime()
        val q = streaming.Streaming.ingestStream(lake, src, ckpt,
          maxFilesPerTrigger = Some(16),
          maxEventsPerTrigger = Some(1000000L))
        q.processAllAvailable()
        val wall = (System.nanoTime() - t0) / 1e9
        q.stop()
        val landed = lake.query().df.count()
        val dlq = lake.deadLetterCount()
        assert(landed + dlq == rows, s"lost rows: $landed + $dlq != $rows")
        assert(dlq > 0, "DLQ leg never exercised")
        println(f"[scale] ingestcurve stream rows=$rows files=$filesN " +
          f"wall=$wall%.1f evps=${(rows / wall).toLong} dlq=$dlq")
        Seq(root, src, ckpt).foreach(d =>
          org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
      }
      // driver-side batch leg (the reference's own shape)
      Seq(200000, 400000).foreach { n =>
        val root = Files.createTempDirectory("ingbatch").toString
        val lake = new sources.DataLakehouse(spark, root, batchSize = n + 1)
        val rows = bars(n.toLong).collect().map(r => graft.OhlcvBar(
          r.getString(0), r.getTimestamp(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getLong(6), r.getString(7))).toSeq
        val t0 = System.nanoTime()
        lake.ingestBatch(rows)
        lake.flush()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[scale] ingestcurve batch rows=$n wall=$wall%.1f " +
          f"evps=${(n / wall).toLong}")
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      }
      // distributed appendDF leg — 32M rung added r11: the 8M point was
      // still rising; the curve needs a visible knee (VERDICT r10 #6)
      Seq(2000000L, 8000000L, 32000000L).foreach { rows =>
        val root = Files.createTempDirectory("ingappend").toString
        val lake = new sources.DataLakehouse(spark, root)
        val df = bars(rows)
        val t0 = System.nanoTime()
        lake.appendDF(df)
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[scale] ingestcurve appendDF rows=$rows wall=$wall%.1f " +
          f"evps=${(rows / wall).toLong}")
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      }
      spark.stop(); return
    }

    // ANN index-lifecycle scale curve (the q65/q66 family): PQ codebook
    // fit (bounded driver sample — must stay FLAT in corpus size),
    // corpus encode (one narrow codegen'd pass — linear), then the
    // steady-state per-query cost: ADC probe over the m-byte codes and
    // the exact-reranked two-stage probe. The production claim under
    // test: queries scan CODES (32× smaller than vectors), fit never
    // re-pays with corpus growth, and probe latency grows only with
    // the code scan.
    if (which == "annscale") {
      val nv = bigEmb.count()
      val qv = bigEmb.filter($"vec_id" === 0)
        .select(functions.VectorOps.toDoubles($"embedding"))
        .head().getSeq[Double](0).toArray
      def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
      val t0 = System.nanoTime()
      val books = operators.SimilaritySearch.fitPqCodebooks(
        bigEmb, "vec_id", "embedding", m = 8, codebookSize = 64)
      val fitS = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val encoded = operators.SimilaritySearch.pqEncode(
        bigEmb, "vec_id", "embedding", books).persist()
      encoded.count()
      val encS = (System.nanoTime() - t1) / 1e9
      def probe(f: => Unit): Double = {
        val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
      }
      val adc = (1 to 5).map(_ => probe {
        operators.SimilaritySearch.pqTopK(encoded, books, qv, 10,
          excludeId = Some(0L)).collect()
      })
      val rer = (1 to 5).map(_ => probe {
        operators.SimilaritySearch.pqTopKReranked(encoded, bigEmb,
          "vec_id", "embedding", books, qv, 10,
          excludeId = Some(0L)).collect()
      })
      println(f"[scale] annscale ${mult}x vectors=$nv fit=$fitS%.1f " +
        f"encode=$encS%.1f adcProbeMed=${med(adc)}%.2f " +
        f"rerankProbeMed=${med(rer)}%.2f")
      spark.stop(); return
    }

    // Skew-bomb for the dedup family: a BOILERPLATE-HEAVY corpus — 80%
    // of long-enough docs share one 22-word template prefix, so the
    // template's ~20 shingles have df ≈ half the corpus (the shared-
    // header/footer shape real crawls have). The caps' specs run on
    // clean corpora; this proves the capped paths stay feasible ON the
    // bomb while recall floors hold: 100 exact-clone pairs per copy are
    // PLANTED (j = 1.0, sharing plenty of cold shingles), and every
    // method must find every planted pair. The template is sized so
    // boiler-only overlap stays BELOW threshold (20 shared shingles vs
    // >= 38+38 unique on >=40-word docs -> j <= 0.21): the true pair
    // set never explodes quadratically, so wall-clock measures operator
    // throughput, not answer size. Copies are Caesar-shifted (each copy
    // its own template at the same 80% density) so the pair set grows
    // mult-x, the crawl-growth shape.
    if (which == "skewbomb") {
      require(mult <= 26, s"shifted copies alias beyond 26x: $mult")
      val alpha = "abcdefghijklmnopqrstuvwxyz"
      val boiler = (1 to 22).map(i => s"boilerplate$i").mkString(" ")
      val base = docs.select($"doc_id",
        when(pmod($"doc_id", lit(10)) < 8 &&
            size(split($"text", " ")) >= 40,
          concat(lit(boiler + " "), $"text")).otherwise($"text").as("text"))
      val clones = base.filter(pmod($"doc_id", lit(50)) === 0)
        .select(($"doc_id" + 500000L).as("doc_id"), $"text")
      val withClones = base.unionAll(clones)
      val corpus = (0 until mult).map { i =>
        val rot = alpha.drop(i % 26) + alpha.take(i % 26)
        withClones.select(($"doc_id" + lit(i * 1000000L)).as("doc_id"),
          translate(lower($"text"), alpha, rot).as("text"))
      }.reduce(_ unionAll _).persist()
      val nDocs = corpus.count()
      val baseIds = docs.filter(pmod($"doc_id", lit(50)) === 0)
        .select($"doc_id").as[Long].collect()
      val planted = (for { i <- 0 until mult; d <- baseIds }
        yield (i * 1000000L + d, i * 1000000L + d + 500000L)).toSet
      def timed(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
        val t = System.nanoTime()
        val res = f.select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
        val secs = (System.nanoTime() - t) / 1e9
        val hit = planted.count(res.contains)
        println(f"[scale] skewbomb $name ${mult}x docs=$nDocs " +
          f"pairs=${res.size} plantedRecall=${hit.toDouble / planted.size}%.3f " +
          f"secs=$secs%.1f")
        assert(hit == planted.size,
          s"$name missed ${planted.size - hit} planted clone pairs")
      }
      timed("jaccardCapped")(operators.Dedup.jaccardPairs(corpus,
        "doc_id", "text", shingleLen = 3, threshold = 0.5,
        maxPostingList = 64))
      timed("ppjoin")(operators.Dedup.jaccardPairsPrefix(corpus,
        "doc_id", "text", shingleLen = 3, threshold = 0.5))
      timed("minhashCapped")(operators.Dedup.minhashPairs(corpus,
        "doc_id", "text", threshold = 0.5, maxBucketSize = 500))
      // the INCREMENTAL capped path on the same bomb: the planted
      // clones ARE the increment (ids >= +500000 within each copy),
      // probed against the standing bombed corpus — every planted pair
      // crosses sides, so recall must still be 1.0 and the
      // jaccardPairsAgainst upper-bound-prune/df>1 cuts are exercised
      // at scale
      locally {
        val t = System.nanoTime()
        val res = operators.Dedup.jaccardPairsAgainst(
            corpus.filter(pmod($"doc_id", lit(1000000L)) >= 500000L),
            corpus.filter(pmod($"doc_id", lit(1000000L)) < 500000L),
            "doc_id", "text", shingleLen = 3, threshold = 0.5,
            maxPostingList = 64)
          .select($"batch_id", $"corpus_id").as[(Long, Long)]
          .collect().map { case (b, c) => (c, b) }.toSet
        val secs = (System.nanoTime() - t) / 1e9
        val hit = planted.count(res.contains)
        println(f"[scale] skewbomb incrementalCapped ${mult}x " +
          f"pairs=${res.size} plantedRecall=${hit.toDouble / planted.size}%.3f " +
          f"secs=$secs%.1f")
        assert(hit == planted.size,
          s"incrementalCapped missed ${planted.size - hit} planted pairs")
      }
      // the bomb is real: the uncapped posting-list join pays the
      // quadratic hot-shingle expansion — only run at small mult
      if (mult <= 2)
        timed("jaccardUNCAPPED")(operators.Dedup.jaccardPairs(corpus,
          "doc_id", "text", shingleLen = 3, threshold = 0.5))
      spark.stop(); return
    }

    // FIX-parse throughput: the live-feed wire parse is pure catalyst
    // HOFs so it must scale out like any operator — this measures
    // messages/sec for mult×200k FIX 4.4 snapshots (encode distributed,
    // untimed; parse + field-sum timed), the number to hold against the
    // reference's declared 10M events/sec feed rate (that rate is the
    // RING BUFFER admission claim, single-node; the parse here includes
    // full checksum verification per message, which a feed handler
    // would also be doing).
    if (which == "fixparse") {
      val nMsgs = mult * 200000L
      val bars = spark.range(nMsgs).map { i =>
        streaming.FeedReplayServer.fixLine(OhlcvBar(
          s"SYM${i % 100}", new java.sql.Timestamp(1718409600000L + i),
          100.0 + (i % 50), 160.0 + (i % 50), 90.0 + (i % 50),
          120.0 + (i % 50), 1000L + i, "equity"))
      }.toDF("value").persist()
      bars.count() // encode outside the timer
      val t0 = System.nanoTime()
      val parsed = streaming.Streaming.parseFixLines(bars)
      val r = parsed.agg(count(lit(1)), count(col("symbol")),
        sum(col("volume"))).head()
      val secs = (System.nanoTime() - t0) / 1e9
      assert(r.getLong(0) == nMsgs && r.getLong(1) == nMsgs) // none nulled
      println(f"[scale] fixparse ${mult}x msgs=$nMsgs secs=$secs%.1f " +
        f"rate=${nMsgs / secs / 1e6}%.2fM msgs/sec (checksum-verified)")
      spark.stop(); return
    }

    // End-to-end live-feed ingest: mult×50k FIX bars replayed over a
    // real WebSocket at full speed -> RFC 6455 decode -> native FIX
    // parse -> validate -> micro-batch txn commits. Measures the
    // through-the-stack bars/sec a single driver-attached feed
    // sustains (the WS reader is one thread by design — a venue
    // connection is one ordered stream; horizontal scale = one source
    // per connection, each its own stream).
    if (which == "feedingest") {
      import java.nio.file.Files
      val nBars = mult * 50000
      val root = Files.createTempDirectory("feedlake").toString
      val ckpt = Files.createTempDirectory("feedckpt").toString
      val lake = new sources.DataLakehouse(spark, root)
      val bars = (0 until nBars).map { i =>
        OhlcvBar(s"SYM${i % 100}",
          new java.sql.Timestamp(1718409600000L + i.toLong),
          100.0 + (i % 50), 160.0 + (i % 50), 90.0 + (i % 50),
          120.0 + (i % 50), 1000L + i, "equity")
      }
      val server = new streaming.FeedReplayServer(
        bars.map(streaming.FeedReplayServer.fixLine), webSocket = true)
      val t0 = System.nanoTime()
      val q = streaming.Streaming.ingestWebSocketStream(lake,
        server.host, server.port, ckpt, streamId = "scale-ws",
        triggerMs = 100, wireFormat = "fix")
      val drainedOk = server.awaitDrained(600000)
      var committed = 0L
      var dlq = 0L
      val deadline = System.currentTimeMillis() + 600000
      while (committed + dlq < nBars && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        committed = lake.query().count
        dlq = lake.deadLetterCount()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      q.stop(); server.close()
      val batches = lake.txnLog.commits().count(_.batchId.isDefined)
      println(f"[scale] feedingest ${mult}x bars=$nBars committed=$committed " +
        f"dlq=$dlq drained=$drainedOk batches=$batches secs=$secs%.1f " +
        f"rate=${committed / secs / 1000}%.1fk bars/sec")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      spark.stop(); return
    }

    // Row ops at scale: copy-on-write UPDATE and ranged DELETE on a
    // mult×2M-row lake must cost O(files touched by the predicate), not
    // O(table) — log stats + blooms locate the files, only those
    // rewrite. Reports files rewritten of total alongside the wall.
    if (which == "rowops") {
      import java.nio.file.Files
      val rows = mult * 2000000L
      val root = Files.createTempDirectory("scalerowops").toString
      val lake = new sources.DataLakehouse(spark, root)
      val cents = pmod(col("id") * 37L, lit(100)).cast("double") / 100.0
      lake.appendDF(spark.range(rows).select(
        concat(lit("SYM"), pmod(col("id"), lit(100))).as("symbol"),
        timestamp_millis(lit(1718409600000L) +
          pmod(col("id"), lit(10)) * 86400000L +
          (col("id") / 10).cast("long")).as("timestamp"),
        (lit(100.0) + pmod(col("id"), lit(50)) + cents).as("open"),
        (lit(160.0) + pmod(col("id"), lit(50)) + cents).as("high"),
        (lit(90.0) + pmod(col("id"), lit(50)) + cents).as("low"),
        (lit(120.0) + pmod(col("id"), lit(50)) + cents).as("close"),
        (lit(1000L) + col("id")).as("volume"),
        lit("equity").as("asset_class")))
      // split each date partition into symbol-clustered files so the
      // file-level claim is visible: a single-symbol predicate should
      // locate its handful of files among all of them via log stats
      lake.compact(maxFilesPerPartition = 0, targetFiles = 16)
      val totalFiles = lake.txnLog.snapshotFiles().size
      // NOTE the generator correlates symbol and date (both ride id):
      // SYM42 trades only on day index 2, SYM7 only on day 7 — the
      // predicates below target the (symbol, day) pairs that exist
      val tU = System.nanoTime()
      val updated = lake.update(
        col("symbol") === "SYM42" &&
          col("date") === "2024-06-17",
        Map("close" -> (col("close") + 1.0)))
      val updateS = (System.nanoTime() - tU) / 1e9
      val uRewrote = lake.txnLog.commits().last.removed.size
      val tD = System.nanoTime()
      val deleted = lake.deleteRange(symbol = Some("SYM7"),
        start = Some(new java.sql.Timestamp(1719014400000L)),
        end = Some(new java.sql.Timestamp(1719100799999L)))
      val deleteS = (System.nanoTime() - tD) / 1e9
      val dRewrote = lake.txnLog.commits().last.removed.size
      println(f"[scale] rowops ${mult}x rows=$rows files=$totalFiles " +
        f"update: $updated rows, $uRewrote files rewritten, $updateS%.1f s; " +
        f"delete: $deleted rows, $dRewrote files rewritten, $deleteS%.1f s")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      spark.stop(); return
    }

    // SemDeDup at scale: the clone-stressed embedding corpus (every
    // vector with mult−1 exact clones — clones share the same k-means
    // cell, the bucket-stress worst case exactly like lshpairs). Cells
    // scaled by the same log2 law as LSH planes so per-cell population
    // stays bounded; wall must stay near-linear in the corpus while the
    // output (clone groups) grows with it. The exact q43 formulation at
    // these sizes would be an O(n²/2) cosine loop; the cell-bucketed
    // path never materializes it.
    if (which == "semdedup") {
      bigEmb.count() // materialize outside the timer
      val nVec = bigEmb.count()
      val cells = math.max(16, (nVec / 1250L).toInt) // ~1250 vectors/cell
      val t0 = System.nanoTime()
      val out = operators.SimilaritySearch.semDedup(
        bigEmb, "vec_id", "embedding", threshold = 0.95, numCells = cells)
      val kept = out.filter(col("keep")).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scale] semdedup ${mult}x vectors=$nVec cells=$cells " +
        f"kept=$kept evicted=${nVec - kept} in $secs%.1f s")
      spark.stop(); return
    }

    // Shallow-clone at scale: a mult×2M-row lake (multi-file, compacted,
    // stats-carrying) cloned via cloneTo — the wall must be O(live
    // files) metadata, with ZERO data bytes written, and the clone's
    // pruned query must hit the carried log stats exactly like the
    // source's (no footer re-derivation). The contrast number is a full
    // physical copy of the same bytes.
    if (which == "clone") {
      import java.nio.file.Files
      val rows = mult * 2000000L
      val root = Files.createTempDirectory("scaleclone").toString
      val lake = new sources.DataLakehouse(spark, root)
      val cents = pmod(col("id") * 37L, lit(100)).cast("double") / 100.0
      lake.appendDF(spark.range(rows).select(
        concat(lit("SYM"), pmod(col("id"), lit(100))).as("symbol"),
        timestamp_millis(lit(1718409600000L) +
          pmod(col("id"), lit(10)) * 86400000L +
          (col("id") / 10).cast("long")).as("timestamp"),
        (lit(100.0) + pmod(col("id"), lit(50)) + cents).as("open"),
        (lit(160.0) + pmod(col("id"), lit(50)) + cents).as("high"),
        (lit(90.0) + pmod(col("id"), lit(50)) + cents).as("low"),
        (lit(120.0) + pmod(col("id"), lit(50)) + cents).as("close"),
        (lit(1000L) + col("id")).as("volume"),
        lit("equity").as("asset_class")))
      lake.compact(maxFilesPerPartition = 0, targetFiles = 16)
      val nFiles = lake.txnLog.snapshotFiles().size
      val tgt = Files.createTempDirectory("scaleclone-tgt").toString + "/t"
      val tClone = System.nanoTime()
      val clone = lake.cloneTo(tgt)
      val cloneS = (System.nanoTime() - tClone) / 1e9
      // contrast: byte copy of the same live set
      val copyDir = Files.createTempDirectory("scaleclone-copy").toString
      val tCopy = System.nanoTime()
      lake.txnLog.snapshotFiles().foreach { rel =>
        val dst = java.nio.file.Paths.get(copyDir, rel)
        Files.createDirectories(dst.getParent)
        Files.copy(java.nio.file.Paths.get(root, rel), dst)
      }
      val copyS = (System.nanoTime() - tCopy) / 1e9
      val tQ = System.nanoTime()
      val qr = clone.query(symbol = Some("SYM42"),
        start = Some(new java.sql.Timestamp(1718496000000L)),
        end = Some(new java.sql.Timestamp(1718582399000L)))
      qr.df.write.format("noop").mode("overwrite").save()
      val queryS = (System.nanoTime() - tQ) / 1e9
      println(f"[scale] clone ${mult}x rows=$rows files=$nFiles " +
        f"clone=$cloneS%.2fs fullCopy=$copyS%.1fs " +
        f"clonePrunedQuery=$queryS%.2fs rowsScanned=${qr.totalRowsScanned}")
      Seq(root, tgt, copyDir).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
      spark.stop(); return
    }

    // Materialized-view refresh at scale: a mult×2M-row fact table with a
    // standing (symbol, date) rollup; a fresh 200k-row increment is folded
    // in by IncrementalView.refresh (reads ONLY the new files, merges
    // keyed partials) vs the full rebuild the removal path takes. The
    // incremental cost must track the INCREMENT, not the table — the
    // property that keeps a 100-TB summary table current on a cadence.
    if (which == "mv") {
      import java.nio.file.Files
      val rows = mult * 2000000L
      val root = Files.createTempDirectory("scalemv").toString
      val viewDir = Files.createTempDirectory("scalemv-view").toString
      val lake = new sources.DataLakehouse(spark, root)
      def bars(n: Long, offset: Long) = {
        val cents = pmod(col("id") * 37L, lit(100)).cast("double") / 100.0
        spark.range(n).select(
          concat(lit("SYM"), pmod(col("id") + offset, lit(100))).as("symbol"),
          timestamp_millis(lit(1718409600000L) +
            pmod(col("id") + offset, lit(10)) * 86400000L +
            ((col("id") + offset) / 10).cast("long")).as("timestamp"),
          (lit(100.0) + pmod(col("id"), lit(50)) + cents).as("open"),
          (lit(160.0) + pmod(col("id"), lit(50)) + cents).as("high"),
          (lit(90.0) + pmod(col("id"), lit(50)) + cents).as("low"),
          (lit(120.0) + pmod(col("id"), lit(50)) + cents).as("close"),
          (lit(1000L) + col("id")).as("volume"),
          lit("equity").as("asset_class"))
      }
      lake.appendDF(bars(rows, 0L))
      sources.IncrementalView.refresh(lake, viewDir) // standing state
      lake.appendDF(bars(200000L, rows))             // the daily increment
      val tInc = System.nanoTime()
      val sInc = sources.IncrementalView.refresh(lake, viewDir)
      val incS = (System.nanoTime() - tInc) / 1e9
      assert(sInc.mode == "incremental", sInc)
      // full rebuild of the same final state (fresh view dir)
      val viewDir2 = Files.createTempDirectory("scalemv-view2").toString
      val tFull = System.nanoTime()
      sources.IncrementalView.refresh(lake, viewDir2)
      val fullS = (System.nanoTime() - tFull) / 1e9
      val viewRows = sources.IncrementalView.read(spark, viewDir).count()
      println(f"[scale] mv ${mult}x rows=$rows increment=200000 " +
        f"viewKeys=$viewRows incRefresh=$incS%.1f fullRebuild=$fullS%.1f " +
        f"speedup=${fullS / incS}%.1fx")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      spark.stop(); return
    }

    // Incremental dedup at scale: a fresh 5k-doc increment (one clone
    // batch) deduped against the mult× standing corpus, vs re-running
    // the full self-join over corpus∪batch. The incremental form's cost
    // must track the BATCH (its posting lists / band probes), not the
    // corpus — the property that makes daily dedup at 100 TB affordable.
    if (which == "incdedup") {
      // a REALISTIC increment: mostly novel content (reversed text forms
      // disjoint shingles) with a 20% slice of true duplicates of corpus
      // docs — daily crawls are mostly new, and the probe's cost should
      // track what actually matches, not the standing corpus
      val batch = docs
        .select(($"doc_id" + lit(900000000L)).as("doc_id"),
          when($"doc_id" % 5 === 0, $"text").otherwise(reverse($"text")).as("text"))
      big.count() // corpus materialized outside both timers
      // the standing index is built ONCE (in production: persisted
      // bucketed tables, appended per accepted increment) — index build
      // time reported separately; the PROBE is the steady-state cost
      val tIdx = System.nanoTime()
      val idx = operators.Dedup.minhashIndex(big, "doc_id", "text").build()
      val idxS = (System.nanoTime() - tIdx) / 1e9
      val t1 = System.nanoTime()
      val incPairs = operators.Dedup.minhashPairsAgainstIndex(batch, idx,
        "doc_id", "text", threshold = 0.5, maxBucketSize = 500).count()
      val incS = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val fullPairs = operators.Dedup.minhashPairs(big.unionAll(batch),
        "doc_id", "text", threshold = 0.5, maxBucketSize = 500).count()
      val fullS = (System.nanoTime() - t2) / 1e9
      println(f"[scale] incdedup ${mult}x corpus=$n batch=5000 " +
        f"indexBuild=$idxS%.1f incPairs=$incPairs probeSecs=$incS%.1f " +
        f"fullPairs=$fullPairs fullSecs=$fullS%.1f speedup=${fullS / incS}%.1fx")
      spark.stop(); return
    }

    // Incremental SEMANTIC dedup: incdedup's vector twin — a 2k-vector
    // increment (80% novel: negated vectors land in the antipodal bucket
    // and can't be near-dups; 20% exact clones of corpus vectors) probed
    // against a standing LshIndex vs re-running the full self-join.
    if (which == "incvec") {
      val nv = bigEmb.count()
      val planes = math.max(4,
        math.ceil(math.log(nv / 64.0) / math.log(2)).toInt)
      val emb = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
        .select($"vec_id", $"embedding").limit(2000)
      val batch = emb.select(($"vec_id" + lit(900000000L)).as("vec_id"),
        when($"vec_id" % 5 === 0, $"embedding")
          .otherwise(transform($"embedding", x => -x)).as("embedding"))
      val tIdx = System.nanoTime()
      val idx = operators.SimilaritySearch.lshIndex(bigEmb, "vec_id",
        "embedding", numPlanes = planes, numTables = 8).build()
      val idxS = (System.nanoTime() - tIdx) / 1e9
      val t1 = System.nanoTime()
      val incPairs = operators.SimilaritySearch.lshPairsAgainstIndex(
        batch, idx, "vec_id", "embedding", threshold = 0.45,
        maxBucketSize = 500).count()
      val incS = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val fullPairs = operators.SimilaritySearch.lshPairs(
        bigEmb.unionAll(batch), "vec_id", "embedding", threshold = 0.45,
        numPlanes = planes, numTables = 8, maxBucketSize = 500).count()
      val fullS = (System.nanoTime() - t2) / 1e9
      println(f"[scale] incvec ${mult}x corpus=$nv batch=2000 planes=$planes " +
        f"indexBuild=$idxS%.1f incPairs=$incPairs probeSecs=$incS%.1f " +
        f"fullPairs=$fullPairs fullSecs=$fullS%.1f speedup=${fullS / incS}%.1fx")
      spark.stop(); return
    }

    // Durable pair table: cold CLUSTER formation from the standing pair
    // table (read parquet + CC rounds) vs the full rebuild (pairs + CC).
    // The pair table is written once (in production: grown per increment
    // by the streaming loop); the cold path's cost should be the CC
    // rounds alone — the claim that made savePairs worth building.
    if (which == "paircc") {
      import java.nio.file.Files
      val path = Files.createTempDirectory("pairtbl").toString
      val pairs = operators.Dedup.minhashPairs(big, "doc_id", "text",
        threshold = 0.5, maxBucketSize = 500)
      operators.Dedup.savePairs(pairs, path) // standing state, untimed
      val t1 = System.nanoTime()
      val cold = operators.Dedup.connectedComponents(
        operators.Dedup.loadPairs(spark, path)).count()
      val coldS = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val rebuilt = operators.Dedup.connectedComponents(
        operators.Dedup.minhashPairs(big, "doc_id", "text",
          threshold = 0.5, maxBucketSize = 500)).count()
      val rebuildS = (System.nanoTime() - t2) / 1e9
      println(f"[scale] paircc ${mult}x docs=$n clustered=$cold " +
        f"coldSecs=$coldS%.1f rebuildClustered=$rebuilt " +
        f"rebuildSecs=$rebuildS%.1f speedup=${rebuildS / coldS}%.1fx")
      assert(cold == rebuilt)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
      spark.stop(); return
    }

    // High-diameter CC worst case: ONE chain of mult×100k nodes
    // (diameter = n−1). Min-label propagation moves the min one hop per
    // round — it would need n rounds (a non-starter at any scale); the
    // large-star/small-star default collapses the same chain in O(log n)
    // alternations. Prints the round count as the direct evidence.
    if (which == "chaincc") {
      val nNodes = mult * 100000L
      val chain = spark.range(1L, nNodes)
        .select($"id".as("a_id"), ($"id" + 1L).as("b_id"))
      val t0 = System.nanoTime()
      // driverFinishEdges = 0: this case EXISTS to evidence the
      // distributed round count, so the hybrid driver finish is off
      val (labels, rounds) =
        operators.Dedup.connectedComponentsStarWithRounds(chain,
          driverFinishEdges = 0L)
      val comps = labels.agg(
        countDistinct($"component"), count(lit(1))).head()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[scale] chaincc ${mult}x nodes=$nNodes diameter=${nNodes - 1} " +
        f"rounds=$rounds components=${comps.getLong(0)} " +
        f"labeled=${comps.getLong(1)} secs=$dt%.1f")
      assert(comps.getLong(0) == 1L && comps.getLong(1) == nNodes)
      spark.stop(); return
    }

    // BEYOND-GATE rung (r12): the blocked-broadcast arm at a corpus the
    // 256 MiB gate provably cannot broadcast (~512k dim-64 vectors,
    // est 549 MB for a chunk-pair union -> auto C=3, 6 passes). The r11
    // run at this regime was the disk-kill (SMJ sorting ~26G candidate
    // rows filled the disk in 5 min); the claim under test is the
    // opposite outcome: lshPairs AUTO-ROUTES to lshPairsBlocked and the
    // run completes with every pass on the broadcast path and ZERO
    // shuffle/sort spill growth on disk. Shards are composite orthogonal
    // transforms (cyclic rotation x deterministic sign-flip mask):
    // within-shard cosine geometry exact, cross-shard decorrelated, so
    // true pairs scale with shard count, never clone-inflated. Usage:
    //   lshblocked <shards> [threshold]    (vectors = 2000 x shards)
    // Equality leg at an overlapping rung both forms can run (e.g. 64
    // shards = 128k, gate-admissible -> monolithic; blocked forced to
    // chunks=3): lshblockedeq <shards> [threshold].
    if (which == "lshblocked" || which == "lshblockedeq") {
      val dim = 64
      val shards = mult
      val thr = args.lift(2).map(_.toDouble).getOrElse(0.9)
      // SPARK_GRAFT_BLOCKED_CKPT_DIR routes the blocked passes through
      // the RELIABLE materialization mode (cluster-safe parquet pass
      // files) instead of localCheckpoint blocks — the r13 rung lever
      val ckpt = sys.env.get("SPARK_GRAFT_BLOCKED_CKPT_DIR").filter(_.nonEmpty)
      ckpt.foreach { d =>
        spark.conf.set(operators.SimilaritySearch.blockedCheckpointDirKey, d)
        println(s"[scale] blocked passes -> reliable parquet files under $d")
      }
      val base = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
      val corpus0 = (0 until shards).map { i =>
        val rot = i % dim
        val rotated =
          if (rot == 0) $"embedding"
          else expr(s"concat(slice(embedding, ${rot + 1}, ${dim - rot})," +
            s" slice(embedding, 1, $rot))")
        // sign-flip mask m = i / dim: coordinate c flips when
        // xxhash64(m, c) is odd — a diagonal orthogonal transform, so
        // composition with the rotation stays orthogonal
        val m = i / dim
        val emb =
          if (m == 0) rotated
          else expr(s"transform($rotated, (x, c) -> " +
            s"CASE WHEN pmod(xxhash64($m, c), 2) = 0 THEN x ELSE -x END)")
        base.select(($"vec_id" + lit(i * 1000000L)).as("vec_id"),
          emb.as("embedding"))
      }
      val shardsDf = corpus0.reduce(_ unionAll _)
      // plant ~1% exact clones under far-offset ids: the base corpus has
      // no 0.9-cosine pairs, and an equality/zero-disk claim over an
      // EMPTY result set proves nothing. Clone ids hash into different
      // chunks than their originals, so the cross-pass path is exercised
      // by pairs that must actually survive it.
      val corpus = shardsDf.unionAll(
        shardsDf.filter(pmod(xxhash64($"vec_id"), lit(100)) === 0)
          .select(($"vec_id" + lit(1000000000000L)).as("vec_id"),
            $"embedding")).persist()
      val nv = corpus.count()
      def freeG: Double =
        new java.io.File("/tmp").getUsableSpace / 1e9
      if (which == "lshblockedeq") {
        // pair-set equality where BOTH forms run: monolithic (broadcast,
        // auto C=1 at this size) vs the blocked decomposition forced to
        // chunks=3. exceptAll in both directions — not just counts.
        val mono = operators.SimilaritySearch.lshPairs(corpus,
          "vec_id", "embedding", threshold = thr, numTables = 14,
          probeFlips = -1)
          .select($"a_id", $"b_id").persist()
        val nMono = mono.count()
        val blockedChunks = args.lift(3).map(_.toInt).getOrElse(3)
        val blocked = operators.SimilaritySearch.lshPairsBlocked(corpus,
          "vec_id", "embedding", threshold = thr, numTables = 14,
          probeFlips = -1, chunks = blockedChunks)
        val b2 = blocked.select($"a_id", $"b_id")
        val missing = mono.exceptAll(b2).count()
        val extra = b2.exceptAll(mono).count()
        println(f"[scale] lshblockedeq vectors=$nv threshold=$thr " +
          f"chunks=$blockedChunks mono=$nMono blocked=${blocked.count()} " +
          f"missing=$missing extra=$extra")
        assert(missing == 0L && extra == 0L,
          s"blocked != monolithic: missing=$missing extra=$extra")
        spark.stop(); return
      }
      val d0 = freeG
      val t = System.nanoTime()
      val pairs = operators.SimilaritySearch.lshPairs(corpus,
        "vec_id", "embedding", threshold = thr, numTables = 14,
        probeFlips = -1)
      val found = pairs.count()
      val wall = (System.nanoTime() - t) / 1e9
      // blocked results return persisted; routing is observable there
      val routed = pairs.storageLevel.useMemory || pairs.storageLevel.useDisk
      println(f"[scale] lshblocked vectors=$nv threshold=$thr " +
        f"pairs=$found wall=$wall%.1f routedToBlocked=$routed " +
        f"diskFreeBeforeG=$d0%.1f diskFreeAfterG=$freeG%.1f")
      assert(routed, "expected auto-routing to the blocked arm")
      pairs.unpersist(blocking = false)
      spark.stop(); return
    }

    // q56's exact config at the 10× corpus, radius law vs the old
    // single-flip probes: quantifies what the r11 completeness fix costs
    // and buys where the adaptive law first leaves the gate geometry
    // (20k vectors -> 8 planes -> law radius 2). Shards rotate the
    // embedding cyclically (orthogonal transform: within-shard cosine
    // geometry exact, cross-shard pairs decorrelated — the catalog-sweep
    // construction), so the TRUE pair set is mult× the base, never
    // clone-inflated.
    if (which == "lshprobe") {
      val dim = 64
      // rotations alias at mult > dim (shard i and i+dim share a
      // rotation, so their vectors pair as exact clones — bucket-stress
      // shape, but the "true pairs = mult× base" claim breaks)
      require(mult <= dim, s"rotation shards alias beyond ${dim}x: $mult")
      val rotated = (0 until mult).map { i =>
        val emb = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
          .select(($"vec_id" + lit(i * 1000000L)).as("vec_id"),
            expr(s"concat(slice(embedding, ${i % dim + 1}, ${dim - i % dim})," +
              s" slice(embedding, 1, ${i % dim}))").as("embedding"))
        emb
      }.reduce(_ unionAll _).persist()
      val nv = rotated.count()
      val thr = args.lift(2).map(_.toDouble).getOrElse(0.45)
      Seq(1, -1).foreach { radius =>
        val t = System.nanoTime()
        val found = operators.SimilaritySearch.lshPairs(rotated,
          "vec_id", "embedding", threshold = thr, numPlanes = 0,
          numTables = 14, maxBucketSize = 500, probeFlips = -1,
          probeRadius = radius).count()
        println(f"[scale] lshprobe vectors=$nv threshold=$thr radius=$radius " +
          f"pairs=$found wall=${(System.nanoTime() - t) / 1e9}%.2f")
      }
      spark.stop(); return
    }

    val t0 = System.nanoTime()
    val pairs = which match {
      case "lshpairs" =>
        // planes scale with log2(n / targetBucketSize): the documented
        // sizing law that keeps per-bucket work bounded as n grows
        val nv = bigEmb.count()
        val planes = math.max(4,
          math.ceil(math.log(nv / 64.0) / math.log(2)).toInt)
        println(s"[scale] lshpairs vectors=$nv numPlanes=$planes")
        operators.SimilaritySearch.lshPairs(bigEmb, "vec_id", "embedding",
          threshold = 0.45, numPlanes = planes, numTables = 8,
          maxBucketSize = 500).count()
      case "minhash" =>
        operators.Dedup.minhashPairs(big, "doc_id", "text",
          threshold = 0.5, maxBucketSize = 500).count()
      case "winnow" =>
        operators.Dedup.winnowFingerprints(big, "doc_id", "text",
          n = 8, w = 8).count()
      case "winnowpairs" =>
        // q51's exact pipeline (fingerprints -> df filter -> posting-list
        // self-join -> minShared agg) on the shifted-copy corpus
        operators.Dedup.winnowPairs(bigShifted, "doc_id", "text",
          n = 8, w = 8, minShared = 3, maxDf = 64).count()
      case "ppjoin" =>
        // q70's exact pipeline (prefix-filtered all-pairs Jaccard) on
        // the shifted-copy corpus
        operators.Dedup.jaccardPairsPrefix(bigShifted, "doc_id", "text",
          shingleLen = 3, threshold = 0.5).count()
      case "cc" =>
        // full pipeline: minhash pairs -> duplicate clusters
        val pairs = operators.Dedup.minhashPairs(big, "doc_id", "text",
          threshold = 0.5, maxBucketSize = 500)
        operators.Dedup.connectedComponents(pairs).count()
      case "ccprofile" =>
        // q55's exact shape: star-CC over the sf0.1 cosine pair set,
        // with -Dgraft.cc.profile=1 round timings on stderr
        val p = queries.DedupQueries.cosinePairs(spark, "/root/testdata/sf0.1")
        p.count() // pair build outside the timer: rounds are the target
        val t = System.nanoTime()
        val cc = operators.Dedup.connectedComponents(p)
        val rows = cc.count()
        println(f"[scale] ccprofile rows=$rows ccSecs=${(System.nanoTime() - t) / 1e9}%.2f")
        rows
      case _ =>
        operators.Dedup.simhashPairs(big, "doc_id", "text",
          maxHamming = 3, maxBucketSize = 500).count()
    }
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[scale] $which ${mult}x docs=$n pairs=$pairs secs=$dt%.1f")
    spark.stop()
  }
}
