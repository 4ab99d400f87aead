package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.sources.DataLakehouse

/** Port of the reference's TestPartitionManager / TestIngestion / TestFlush
  * / TestQuery (test_core.py:136-305) on the FIXTURES.md A2/A4/A5 fixtures,
  * plus the txn-log surface the reference only declares (time travel,
  * compaction, snapshot isolation).
  */
class LakehouseSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def bar(i: Int): OhlcvBar = OhlcvBar(
    symbol = if (i % 2 == 0) "AAPL" else "GOOGL",
    timestamp = new Timestamp(ts("2024-06-15 09:30:00").getTime + i * 3600L * 1000),
    open = 150.0 + i, high = 155.0 + i, low = 149.0 + i, close = 153.0 + i,
    volume = 1000000L + 1000L * i, asset_class = AssetClass.Equity)

  private val sampleBars: Seq[OhlcvBar] = (0 until 10).map(bar)

  private def newLake(batchSize: Int = 5): DataLakehouse =
    new DataLakehouse(spark, tempDir("lake"), batchSize = batchSize)

  // --- ingestion (test_core.py:171-219)

  test("ingest buffers until batchSize then auto-flushes") {
    val lake = newLake(batchSize = 5)
    (0 until 4).foreach(i => assert(lake.ingest(bar(i))))
    assert(lake.bufferedCount == 4)
    assert(lake.txnLog.currentVersion() == -1L) // nothing flushed yet
    lake.ingest(bar(4))
    assert(lake.bufferedCount == 0)
    assert(lake.txnLog.currentVersion() == 0L) // one commit
  }

  test("invalid bar rejected, counted, and dead-lettered") {
    val lake = newLake()
    val bad = bar(0).copy(high = 1.0, low = 2.0)
    assert(!lake.ingest(bad))
    assert(lake.errorCount == 1)
    assert(lake.deadLetterCount() == 1)
    assert(lake.bufferedCount == 0)
  }

  test("ingestBatch returns whole-batch stats") {
    val lake = newLake(batchSize = 3) // forces mid-batch size > batch
    val bad = bar(0).copy(volume = -5)
    val stats = lake.ingestBatch(sampleBars :+ bad)
    assert(stats.rowsIngested == 10)
    assert(stats.errors == 1)
    assert(stats.partitionsWritten == 1) // all 10 bars land on 2024-06-15
    assert(stats.elapsedMs >= 0)
  }

  test("flush on empty buffer is a no-op") {
    val lake = newLake()
    assert(lake.flush() == 0L)
    assert(lake.txnLog.currentVersion() == -1L)
  }

  // --- partitioning + pruning (test_core.py:136-166)

  test("log file-stats prune files by symbol and time without partitioning") {
    // Delta-style skipping (reference README.md:131): no symbol
    // partitioning here — pruning works from the (symbol, timestamp)
    // bounds recorded in each commit, proven via scan accounting
    val lake = newLake()
    // three commits, each one symbol, same date partition
    Seq("AAPL", "GOOGL", "MSFT").zipWithIndex.foreach { case (s, i) =>
      lake.ingestBatch((0 until 4).map(j =>
        bar(j).copy(symbol = s,
          timestamp = ts(s"2024-06-15 1$i:0$j:00"))))
    }
    assert(lake.txnLog.fileStatsAt().nonEmpty)
    // symbol predicate: only GOOGL's file is scanned
    val bySym = lake.query(symbol = Some("GOOGL"))
    assert(bySym.count == 4)
    assert(bySym.totalRowsScanned == 4)
    // sub-day time range: date pruning alone can't help (one partition);
    // the µs bounds in the log skip the other two files
    val byTime = lake.query(
      start = Some(ts("2024-06-15 11:00:00")),
      end = Some(ts("2024-06-15 11:59:59")))
    assert(byTime.count == 4)
    assert(byTime.totalRowsScanned == 4)
    // a predicate matching nothing scans nothing
    assert(lake.query(symbol = Some("ZZZ")).totalRowsScanned == 0)
  }

  test("addFiles: foreign millis-timestamp parquet gets no ts stats, never pruned") {
    val lake = newLake()
    val root = lake.root
    // externally-written file with TIMESTAMP_MILLIS — µs-interpreted
    // bounds would be off by 1000x and prune it out of every query
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
    try {
      import spark.implicits._
      Seq(bar(0)).toDS().toDF()
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$root/date=2024-06-15/ext")
    } finally spark.conf.set(
      "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    val rel = java.nio.file.Files.list(
        java.nio.file.Paths.get(root, "date=2024-06-15/ext"))
      .filter(_.toString.endsWith(".parquet")).findFirst().get()
    val relPath = java.nio.file.Paths.get(root).relativize(rel).toString
    lake.addFiles(Seq(relPath))
    // no stats recorded for the foreign unit...
    assert(!lake.txnLog.fileStatsAt().contains(relPath))
    // ...so the file survives every predicate and the row is found
    val qr = lake.query(symbol = Some(bar(0).symbol),
      start = Some(ts("2024-06-15 00:00:00")),
      end = Some(ts("2024-06-15 23:59:59")))
    assert(qr.count == 1)
  }

  test("range-disjoint compaction makes file-stats pruning bite on mixed files") {
    val lake = newLake()
    // four commits, EACH mixing all four symbols: per-file stats span
    // everything, so symbol queries must scan all files...
    val syms = Seq("AAPL", "GOOGL", "MSFT", "NVDA")
    (0 until 4).foreach { i =>
      lake.ingestBatch(syms.zipWithIndex.map { case (s, j) =>
        bar(j).copy(symbol = s, timestamp = ts(s"2024-06-15 1$i:0$j:00"))
      })
    }
    val before = lake.query(symbol = Some("MSFT"))
    assert(before.count == 4)
    assert(before.totalRowsScanned == 16) // every file overlaps MSFT
    val key = Seq("timestamp", "symbol", "volume").map(col)
    val full = lake.query().df.orderBy(key: _*).collect().toSeq

    // ...compaction range-partitions by the cluster key, so the four
    // output files hold DISJOINT symbol ranges and the log stats skip
    assert(lake.compact(maxFilesPerPartition = 1, targetFiles = 4) >= 0)
    lake.vacuum(retainMs = 0L)
    val after = lake.query(symbol = Some("MSFT"))
    assert(after.count == 4)
    assert(after.totalRowsScanned < 16,
      s"expected skipping after range compaction, scanned ${after.totalRowsScanned}")
    // and the table itself is unchanged
    assert(lake.query().df.orderBy(key: _*).collect().toSeq == full)
  }

  test("symbol partition values with escaped characters prune correctly") {
    // Spark Hive-escapes special chars in partition paths (A B -> A%20B);
    // pruning must compare the UNESCAPED value or these files vanish
    // from symbol queries
    val lake = new DataLakehouse(spark, tempDir("esclake"),
      partitionCols = Seq("date", "symbol"))
    val odd = Seq("A B", "C:D", "PLAIN")
    lake.ingestBatch(odd.zipWithIndex.map { case (s, i) =>
      bar(i).copy(symbol = s)
    })
    odd.foreach { s =>
      val qr = lake.query(symbol = Some(s))
      assert(qr.count == 1, s"symbol '$s' lost by path-escape pruning")
      assert(qr.totalRowsScanned == 1) // and still actually pruned
    }
  }

  test("partitionCols=date,symbol: layout, symbol pruning, compaction") {
    // the reference's declared partition_cols=['date','symbol']
    // (README.md:67) as a two-level Hive layout
    val root = tempDir("lake2col")
    val lake = new DataLakehouse(spark, root,
      partitionCols = Seq("date", "symbol"))
    val bars = for {
      d <- Seq("2024-06-15", "2024-06-16"); i <- 0 until 6
    } yield bar(i).copy(timestamp = ts(s"$d 10:0$i:00"))
    lake.ingestBatch(bars) // 3 AAPL + 3 GOOGL per day
    assert(lake.listPartitions() == Seq(
      "2024-06-15/AAPL", "2024-06-15/GOOGL",
      "2024-06-16/AAPL", "2024-06-16/GOOGL"))
    assert(lake.txnLog.snapshotFiles().forall(
      _.matches("date=\\d{4}-\\d{2}-\\d{2}/symbol=[A-Z]+/.*")))

    // symbol pruning happens at the FILE level: scan accounting (footer
    // row counts of the pruned file set) must only see AAPL rows
    val qr = lake.query(symbol = Some("AAPL"))
    assert(qr.count == 6)
    assert(qr.totalRowsScanned == 6)
    // …and composes with the date range prune
    val qr2 = lake.query(symbol = Some("GOOGL"),
      start = Some(ts("2024-06-16 00:00:00")),
      end = Some(ts("2024-06-16 23:59:59")))
    assert(qr2.count == 3)
    assert(qr2.totalRowsScanned == 3)
    // symbol values come back from the path, not the data files
    assert(qr2.df.select("symbol").distinct().collect().map(_.getString(0))
      .toSeq == Seq("GOOGL"))

    // second append fragments the leaves; compaction regroups per LEAF
    // partition and the table reads identically after a vacuum
    lake.ingestBatch(bars)
    val before = lake.query().df.orderBy("timestamp", "symbol", "volume")
      .collect().toSeq
    assert(lake.compact() >= 0L)
    lake.vacuum(retainMs = 0L)
    assert(lake.listPartitions().size == 4)
    val after = lake.query().df.orderBy("timestamp", "symbol", "volume")
      .collect().toSeq
    assert(after == before)
    assert(lake.query(symbol = Some("AAPL")).totalRowsScanned == 12)
  }

  test("multi-day batch writes one partition per day; range prunes exactly") {
    val lake = newLake()
    val days = Seq("2024-06-13", "2024-06-14", "2024-06-15", "2024-06-16")
    val bars = days.zipWithIndex.map { case (d, i) =>
      bar(i).copy(timestamp = ts(s"$d 10:00:00"))
    }
    lake.ingestBatch(bars)
    assert(lake.listPartitions() == days)

    // A5: query [06-14, 06-15] must scan exactly the two middle partitions
    val qr = lake.query(
      start = Some(ts("2024-06-14 00:00:00")),
      end = Some(ts("2024-06-15 23:59:59")))
    assert(qr.count == 2)
    assert(qr.totalRowsScanned == 2) // pruning proof: only 2 rows' files read
  }

  test("one-sided time range still prunes (reference scanned everything)") {
    val lake = newLake()
    val bars = Seq("2024-06-13", "2024-06-14", "2024-06-15").zipWithIndex
      .map { case (d, i) => bar(i).copy(timestamp = ts(s"$d 10:00:00")) }
    lake.ingestBatch(bars)
    val qr = lake.query(start = Some(ts("2024-06-15 00:00:00")))
    assert(qr.count == 1)
    assert(qr.totalRowsScanned == 1)
  }

  // --- query semantics (test_core.py:248-305)

  test("query all / symbol filter / inclusive time range / sortedness") {
    val lake = newLake()
    lake.ingestBatch(sampleBars)

    val all = lake.query()
    assert(all.count == 10)
    assert(all.queryTimeMs >= 0)

    val aapl = lake.query(symbol = Some("AAPL"))
    assert(aapl.count == 5)
    assert(aapl.df.select("symbol").distinct().collect().map(_.getString(0))
      .toSeq == Seq("AAPL"))

    // inclusive bounds: [bar1.ts, bar3.ts] picks bars 1,2,3
    val ranged = lake.query(
      start = Some(sampleBars(1).timestamp),
      end = Some(sampleBars(3).timestamp))
    assert(ranged.count == 3)

    val times = all.df.collect().map(_.getTimestamp(1).getTime).toSeq
    assert(times == times.sorted)
  }

  test("query on empty lakehouse returns empty frame with schema") {
    val lake = newLake()
    val qr = lake.query()
    assert(qr.count == 0)
    assert(qr.totalRowsScanned == 0)
    assert(qr.df.columns.contains("symbol"))
  }

  // --- txn log: snapshots, time travel, compaction (S11/S13/S14)

  test("time travel reads the snapshot as of a version") {
    val lake = newLake()
    lake.ingestBatch(sampleBars.take(4)) // v0
    lake.ingestBatch(sampleBars.drop(4)) // v1
    assert(lake.timeTravel(0).count() == 4)
    assert(lake.timeTravel(1).count() == 10)
    assert(lake.query().count == 10)
  }

  test("compaction merges files atomically and preserves data + history") {
    val lake = newLake()
    sampleBars.grouped(2).foreach(g => lake.ingestBatch(g)) // 5 commits
    val filesBefore = lake.txnLog.snapshotFiles().size
    assert(filesBefore >= 5)
    val v = lake.compact(maxFilesPerPartition = 1)
    assert(v == lake.txnLog.currentVersion())
    assert(lake.txnLog.snapshotFiles().size < filesBefore)
    assert(lake.query().count == 10) // data intact
    assert(lake.timeTravel(v - 1).count() == 10) // pre-compaction snapshot intact
    val removed = lake.vacuum(retainMs = 0L)
    assert(removed >= filesBefore - lake.txnLog.snapshotFiles().size)
    assert(lake.query().count == 10) // latest snapshot unaffected by vacuum
  }

  test("vacuum retention: recently removed files survive until the window ages out") {
    val lake = newLake()
    sampleBars.grouped(2).foreach(g => lake.ingestBatch(g))
    val v = lake.compact(maxFilesPerPartition = 1)
    // default-window vacuum (7 days): the files the compaction just
    // removed are seconds old — an in-flight reader of the
    // pre-compaction snapshot (or in-window time travel) still needs
    // them, so NOTHING may be reclaimed
    assert(lake.vacuum() == 0L)
    assert(lake.timeTravel(v - 1).count() == 10) // old snapshot still readable
    // retention 0 = the aggressive semantics: dead files reclaimed now,
    // and the old snapshot's data is sacrificed (Delta VACUUM contract)
    assert(lake.vacuum(retainMs = 0L) > 0L)
    assert(lake.query().count == 10)
  }

  test("txn-log checkpoints accelerate snapshots without changing them") {
    val lake = newLake() // checkpoint interval 10
    (0 until 12).foreach(i => lake.ingestBatch(Seq(bar(i))))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
      lake.root, "_txn_log", "checkpoint-v00000010.json")))
    // checkpointed resolution == naive full replay, at every version shape:
    // before / at / after the checkpoint, and head
    for (v <- Seq(3L, 10L, 11L, Long.MaxValue)) {
      val naive = scala.collection.mutable.LinkedHashSet.empty[String]
      lake.txnLog.commits(v).foreach { c => naive ++= c.added; naive --= c.removed }
      assert(lake.txnLog.snapshotFiles(v).toSet == naive.toSet, s"v=$v")
    }
    assert(lake.query().count == 12)
    assert(lake.timeTravel(4).count() == 5)
  }

  test("idempotent batch commits (streaming exactly-once hook)") {
    val lake = newLake()
    import spark.implicits._
    val df = spark.createDataset(sampleBars.take(3)).toDF()
    lake.appendDF(df, batchId = Some("s1-0"))
    lake.appendDF(df, batchId = Some("s1-0")) // replay must be a no-op
    assert(lake.query().count == 3)
  }

  test("csv-format lakehouse: ingest, prune, query round-trip (S2/S4)") {
    val lake = new DataLakehouse(spark, tempDir("csvlake"), format = "csv")
    val stats = lake.ingestBatch(sampleBars)
    assert(stats.rowsIngested == 10)
    val qr = lake.query(symbol = Some("AAPL"))
    assert(qr.count == 5)
    assert(lake.query().totalRowsScanned == 10) // header-aware line counts
    val r = qr.df.head()
    assert(r.getAs[Double]("open") == 150.0) // schema-on-read casts applied
  }

  test("mixed-format table: CSV registered via addFiles, dispatched per suffix") {
    val lake = newLake()
    lake.ingestBatch(sampleBars) // parquet, all on date=2024-06-15
    // produce a CSV partition elsewhere, copy the files in place, register
    val csvSrc = new DataLakehouse(spark, tempDir("csvsrc"), format = "csv")
    val msft = (0 until 3).map(i => bar(i).copy(symbol = "MSFT",
      timestamp = new Timestamp(ts("2024-06-16 10:00:00").getTime + i * 60000L)))
    csvSrc.ingestBatch(msft)
    import java.nio.file.{Files => JFiles, Paths => JPaths}
    import scala.jdk.CollectionConverters._
    val srcRoot = JPaths.get(csvSrc.root)
    val rels = {
      val s = JFiles.walk(srcRoot)
      try s.iterator().asScala.filter(_.toString.endsWith(".csv"))
        .map(srcRoot.relativize(_).toString).toList
      finally s.close()
    }
    assert(rels.nonEmpty)
    rels.foreach { r =>
      val tgt = JPaths.get(lake.root, r)
      JFiles.createDirectories(tgt.getParent)
      JFiles.copy(JPaths.get(csvSrc.root, r), tgt)
    }
    lake.addFiles(rels)
    assert(lake.query().count == 13) // both formats in one read
    assert(lake.query().totalRowsScanned == 13) // csv line counts recorded
    // partition pruning applies to the registered partition
    val day2 = lake.query(start = Some(ts("2024-06-16 00:00:00")))
    assert(day2.totalRowsScanned == 3)
    assert(day2.df.select("symbol").distinct().head().getString(0) == "MSFT")
    // filters apply across formats; schema-on-read casts on the csv side
    assert(lake.query(symbol = Some("AAPL")).count == 5)
    assert(lake.query(symbol = Some("MSFT")).df.head().getAs[Double]("open") == 150.0)
    // compaction reads each suffix with its own source and rewrites to
    // the table's primary format — convert-in-place for registered CSV
    lake.compact(maxFilesPerPartition = 0)
    val after = lake.txnLog.snapshotFiles()
    assert(after.nonEmpty && after.forall(_.endsWith(".parquet")))
    assert(lake.query().count == 13)
    assert(lake.query(symbol = Some("MSFT")).count == 3)
  }

  test("schema evolution: later commit adds a column without rewrite") {
    val lake = newLake()
    lake.ingestBatch(sampleBars.take(3))
    import spark.implicits._
    val extended = spark.createDataset(sampleBars.drop(3).take(2)).toDF()
      .withColumn("exchange", org.apache.spark.sql.functions.lit("NASDAQ"))
    lake.appendDF(extended)
    val merged = lake.query(mergeSchema = true).df
    assert(merged.columns.contains("exchange"))
    assert(merged.count() == 5)
    // old rows read as null, new rows carry the value
    assert(merged.filter($"exchange".isNull).count() == 3)
    assert(merged.filter($"exchange" === "NASDAQ").count() == 2)
    // plain fixed-schema read still works over the mixed file set
    assert(lake.query().count == 5)
  }

  test("sql over the registered snapshot (VWAP of README.md:77-81)") {
    val lake = newLake()
    lake.ingestBatch(sampleBars)
    val vwap = lake.sql(
      """SELECT symbol, SUM(close * volume) / SUM(volume) AS vwap
        |FROM trades GROUP BY symbol ORDER BY vwap DESC LIMIT 10""".stripMargin)
    assert(vwap.count() == 2)
    assert(vwap.columns.toSeq == Seq("symbol", "vwap"))
  }

  test("sql time travel: FOR VERSION / TIMESTAMP AS OF pin the snapshot") {
    val lake = newLake()
    lake.ingestBatch(sampleBars.take(4)) // v0
    val tsBetween = System.currentTimeMillis()
    Thread.sleep(5) // commit timestamps are ms-resolution
    lake.ingestBatch(sampleBars.drop(4)) // v1
    assert(lake.sql("SELECT count(*) c FROM trades").head().getLong(0) == 10)
    assert(lake.sql("SELECT count(*) c FROM trades FOR VERSION AS OF 0")
      .head().getLong(0) == 4)
    // keyword case + surrounding clauses survive the strip
    assert(lake.sql(
      "SELECT count(*) c FROM trades for version as of 0 WHERE volume >= 0")
      .head().getLong(0) == 4)
    val tsStr = new Timestamp(tsBetween).toString
    assert(lake.sql(s"SELECT count(*) c FROM trades FOR TIMESTAMP AS OF '$tsStr'")
      .head().getLong(0) == 4)
    // two conflicting pins in one statement are rejected loudly
    intercept[IllegalArgumentException] {
      lake.sql("SELECT * FROM trades FOR VERSION AS OF 0 " +
        "JOIN trades FOR VERSION AS OF 1 USING (symbol)")
    }
    // a '$' in the table name must be treated as a literal in the
    // rewrite, not a regex group reference: the call must reach Spark's
    // own view-name validation (AnalysisException) instead of dying
    // inside the regex engine with a cryptic group-reference error
    intercept[org.apache.spark.sql.AnalysisException] {
      lake.sql("SELECT count(*) c FROM `t$1` FOR VERSION AS OF 0",
        tableName = "t$1")
    }
  }

  test("batch replay in a REPLACED driver process is a no-op") {
    import spark.implicits._
    val root = tempDir("lakereplay")
    val lake1 = new DataLakehouse(spark, root)
    val df = spark.createDataset(sampleBars.take(3)).toDF()
    assert(lake1.appendDF(df, batchId = Some("s2-0")) > 0)
    // a NEW lakehouse instance over the same root = a replaced driver:
    // it must see the predecessor's committed batch id from the log
    val lake2 = new DataLakehouse(spark, root)
    assert(lake2.appendDF(df, batchId = Some("s2-0")) == 0L)
    assert(lake2.query().count == 3)
    assert(lake2.txnLog.currentVersion() == 0L) // no second commit
  }

  test("AS OF timestamp before table history fails loudly, not silently empty") {
    val lake = newLake()
    lake.ingestBatch(sampleBars)
    // versionAsOf resolves -1 for a pre-history timestamp — restore()
    // treats that as an error sentinel, and the read path must too: a
    // silent empty snapshot is indistinguishable from an empty table
    val e = intercept[IllegalArgumentException] {
      lake.query(asOfTimestampMs = Some(0L))
    }
    assert(e.getMessage.contains("no committed snapshot"))
  }
}
