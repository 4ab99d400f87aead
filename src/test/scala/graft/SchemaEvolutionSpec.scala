package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.DataLakehouse

/** Schema-evolution DDL (ALTER TABLE ADD/DROP COLUMN) and the monotone
  * schema record. The contracts that matter at 100 TB: column DDL is
  * METADATA-ONLY (zero data files touched at any table size), reads at
  * old versions are unaffected (time travel), and the recorded schema
  * can only narrow through an EXPLICIT drop — never as a side effect
  * of a producer that hasn't learned the new column yet.
  */
class SchemaEvolutionSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def bar(sym: String, t: String): OhlcvBar =
    OhlcvBar(symbol = sym, timestamp = ts(t),
      open = 150.0, high = 155.0, low = 149.0, close = 153.0,
      volume = 1000L, asset_class = AssetClass.Equity)

  private def seeded(): DataLakehouse = {
    val lake = new DataLakehouse(spark, tempDir("schemaevo"))
    lake.ingestBatch(Seq(
      bar("AAPL", "2024-06-15 09:30:00"), bar("GOOGL", "2024-06-15 09:30:00")))
    lake
  }

  test("addColumn is metadata-only; old rows read NULL; time travel predates it") {
    val lake = seeded()
    val filesBefore = lake.txnLog.snapshotFiles().toSet
    val v = lake.txnLog.currentVersion()

    lake.addColumn("exchange", StringType)
    assert(lake.txnLog.snapshotFiles().toSet == filesBefore) // zero data churn
    val df = lake.query().df
    assert(df.columns.contains("exchange"))
    assert(df.filter(col("exchange").isNull).count() == 2)
    // the pre-DDL snapshot has no such column
    assert(!lake.timeTravel(v).columns.contains("exchange"))
  }

  test("sql ALTER TABLE ADD COLUMN / ADD COLUMNS / DROP COLUMN route and parse types") {
    val lake = seeded()
    lake.sql("ALTER TABLE trades ADD COLUMN venue STRING")
    lake.sql("ALTER TABLE trades ADD COLUMNS (fee DECIMAL(10,2), seq BIGINT)")
    val schema = lake.query().df.schema
    assert(schema("venue").dataType == StringType)
    assert(schema("fee").dataType == DecimalType(10, 2))
    assert(schema("seq").dataType == LongType)

    lake.sql("ALTER TABLE trades DROP COLUMN seq")
    assert(!lake.query().df.columns.contains("seq"))
  }

  test("ADD COLUMNS is atomic: a duplicate in the list adds nothing") {
    val lake = seeded()
    val v = lake.txnLog.currentVersion()
    val e = intercept[IllegalArgumentException] {
      lake.sql("ALTER TABLE trades ADD COLUMNS (venue STRING, close DOUBLE)")
    }
    assert(e.getMessage.contains("already exists"))
    assert(lake.txnLog.currentVersion() == v) // no partial commit
    assert(!lake.query().df.columns.contains("venue"))
  }

  test("INSERT with an explicit column list fills unnamed columns with NULL") {
    val lake = seeded()
    lake.addColumn("venue", StringType)
    lake.addColumn("fee", DoubleType)
    val m = lake.sql(
      "INSERT INTO trades (symbol, timestamp, open, high, low, close, volume, asset_class, venue) " +
        "VALUES ('NVDA', timestamp'2024-06-16 09:30:00', 90.0, 95.0, 89.0, 94.0, 500, 'equity', 'XNAS')")
    assert(m.head().getLong(0) == 1L)
    val row = lake.query().df.filter(col("symbol") === "NVDA").head()
    assert(row.getAs[String]("venue") == "XNAS")
    assert(row.isNullAt(row.fieldIndex("fee"))) // unnamed -> NULL
  }

  test("INSERT column list: case-insensitive names; duplicates and unknowns loud") {
    val lake = seeded()
    lake.sql("INSERT INTO trades (SYMBOL, Timestamp, open, high, low, close, volume, asset_class) " +
      "VALUES ('TSLA', timestamp'2024-06-16 09:30:00', 1.0, 2.0, 0.5, 1.5, 10, 'equity')")
    assert(lake.query().df.filter(col("symbol") === "TSLA").count() == 1)
    val dup = intercept[IllegalArgumentException] {
      lake.sql("INSERT INTO trades (symbol, SYMBOL) VALUES ('A', 'B')")
    }
    assert(dup.getMessage.contains("duplicate"))
    val unk = intercept[IllegalArgumentException] {
      lake.sql("INSERT INTO trades (symbol, nope) VALUES ('A', 'B')")
    }
    assert(unk.getMessage.contains("unknown INSERT column"))
  }

  test("a plain append cannot erase a DDL-added column from the record") {
    val lake = seeded()
    lake.addColumn("exchange", StringType)
    // a producer that never learned the new column appends the old shape
    lake.ingestBatch(Seq(bar("MSFT", "2024-06-16 09:30:00")))
    val df = lake.query().df
    assert(df.columns.contains("exchange")) // monotone record
    assert(df.count() == 3)
    assert(df.filter(col("exchange").isNull).count() == 3)
  }

  test("an append whose batch re-types an existing column is rejected loudly") {
    val lake = seeded()
    lake.addColumn("fee", DoubleType)
    import spark.implicits._
    val bad = Seq(("NVDA", ts("2024-06-16 09:30:00"), 90.0, 95.0, 89.0, 94.0,
      500L, "equity", "not-a-double"))
      .toDF("symbol", "timestamp", "open", "high", "low", "close",
        "volume", "asset_class", "fee")
    val e = intercept[IllegalArgumentException] { lake.appendDF(bad) }
    assert(e.getMessage.contains("schema conflict on 'fee'"))
  }

  test("dropColumn hides the column from reads but time travel still sees it") {
    val lake = seeded()
    lake.addColumn("venue", StringType)
    import spark.implicits._
    val withVenue = Seq(("NVDA", ts("2024-06-16 09:30:00"), 90.0, 95.0, 89.0,
      94.0, 500L, "equity", "XNAS"))
      .toDF("symbol", "timestamp", "open", "high", "low", "close",
        "volume", "asset_class", "venue")
    lake.appendDF(withVenue)
    val vWith = lake.txnLog.currentVersion()

    lake.dropColumn("venue")
    assert(!lake.query().df.columns.contains("venue"))
    assert(lake.query().df.count() == 3) // data intact
    // pre-drop snapshot still projects it (file bytes untouched)
    val old = lake.timeTravel(vWith)
    assert(old.filter(col("venue") === "XNAS").count() == 1)
  }

  test("dropColumn guards: core/partition columns, CSV format, constraint references") {
    val lake = seeded()
    intercept[IllegalArgumentException] { lake.dropColumn("close") }
    intercept[IllegalArgumentException] { lake.dropColumn("date") }

    lake.addColumn("fee", DoubleType)
    lake.addConstraint("fee_nonneg", "fee >= 0")
    val e = intercept[IllegalArgumentException] { lake.dropColumn("fee") }
    assert(e.getMessage.contains("fee_nonneg"))
    lake.dropConstraint("fee_nonneg")
    lake.dropColumn("fee") // now legal
    assert(!lake.query().df.columns.contains("fee"))

    val csvLake = new DataLakehouse(spark, tempDir("schemaevo-csv"), format = "csv")
    csvLake.ingestBatch(Seq(bar("AAPL", "2024-06-15 09:30:00")))
    csvLake.addColumn("venue", StringType) // trailing add is csv-sound
    assert(csvLake.query().df.columns.contains("venue"))
    val c = intercept[IllegalArgumentException] { csvLake.dropColumn("venue") }
    assert(c.getMessage.contains("parquet"))
  }

  test("racing column DDL is serializable: the loser throws, a re-run lands both") {
    val lake = seeded()
    var fired = false
    lake.beforeSchemaCommit = () => if (!fired) {
      fired = true
      // a sibling instance on the same root wins the window
      new DataLakehouse(spark, lake.root).addColumn("venue", StringType)
    }
    val e = intercept[graft.sources.TxnLog.SchemaConflictException] {
      lake.addColumn("fee", DoubleType)
    }
    assert(e.getMessage.contains("conflicting schema change"))
    lake.beforeSchemaCommit = () => ()
    lake.addColumn("fee", DoubleType) // re-run against the new record
    val cols = lake.query().df.columns
    assert(cols.contains("venue") && cols.contains("fee")) // neither clobbered
  }

  test("an append racing a column DDL re-merges and keeps the new column") {
    val lake = seeded()
    var fired = false
    lake.beforeDataCommit = () => if (!fired) {
      fired = true
      new DataLakehouse(spark, lake.root).addColumn("venue", StringType)
    }
    // the append's schema snapshot predates the DDL; expectedSchema makes
    // the first commit attempt conflict, and the retry re-merges over the
    // NEW record — the column survives an old-shape producer mid-race
    lake.ingestBatch(Seq(bar("MSFT", "2024-06-16 09:30:00")))
    lake.beforeDataCommit = () => ()
    val df = lake.query().df
    assert(df.columns.contains("venue"))
    assert(df.count() == 3)
  }

  test("restore racing a column DDL loses loudly instead of erasing it") {
    val lake = seeded()
    val v = lake.txnLog.currentVersion()
    lake.ingestBatch(Seq(bar("MSFT", "2024-06-16 09:30:00")))
    var fired = false
    val e = intercept[graft.sources.TxnLog.SchemaConflictException] {
      lake.restoreImpl(v, () => if (!fired) {
        fired = true
        new DataLakehouse(spark, lake.root).addColumn("venue", StringType)
      })
    }
    assert(e.getMessage.contains("conflicting schema change"))
    // the DDL survived; a deliberate re-run rewinds wholesale as asked
    assert(lake.query().df.columns.contains("venue"))
    lake.restore(v)
    assert(!lake.query().df.columns.contains("venue"))
    assert(lake.query().df.count() == 2)
  }

  test("dropColumn racing addConstraint on that column loses loudly (cross-metadata)") {
    val lake = seeded()
    lake.addColumn("fee", DoubleType)
    var fired = false
    lake.beforeSchemaCommit = () => if (!fired) {
      fired = true
      // sibling registers a CHECK over the column mid-drop: if the drop
      // still committed, the table would carry a constraint over a
      // non-existent column and every later append would die analyzing it
      new DataLakehouse(spark, lake.root).addConstraint("fee_nonneg", "fee >= 0")
    }
    intercept[java.util.ConcurrentModificationException] {
      lake.dropColumn("fee")
    }
    lake.beforeSchemaCommit = () => ()
    // both survived the race; the re-run sees the constraint and refuses
    assert(lake.constraints.contains("fee_nonneg"))
    val e = intercept[IllegalArgumentException] { lake.dropColumn("fee") }
    assert(e.getMessage.contains("fee_nonneg"))
    lake.ingestBatch(Seq(bar("MSFT", "2024-06-16 09:30:00"))) // appends still work
  }

  test("addConstraint racing a dropColumn of its column loses loudly (mirror image)") {
    val lake = seeded()
    lake.addColumn("fee", DoubleType)
    var fired = false
    lake.beforeSchemaCommit = () => if (!fired) {
      fired = true
      // the column vanishes between addConstraint's validation (which
      // resolved "fee >= 0" against the old schema) and its commit
      new DataLakehouse(spark, lake.root).dropColumn("fee")
    }
    intercept[graft.sources.TxnLog.SchemaConflictException] {
      lake.addConstraint("fee_nonneg", "fee >= 0")
    }
    lake.beforeSchemaCommit = () => ()
    // the drop won; no orphaned constraint registered, re-run resolves
    // against the new schema and fails ITS OWN analysis loudly
    assert(lake.constraints.isEmpty)
    intercept[Exception] { lake.addConstraint("fee_nonneg", "fee >= 0") }
    assert(lake.constraints.isEmpty)
    lake.ingestBatch(Seq(bar("MSFT", "2024-06-16 09:30:00"))) // appends fine
  }

  test("csv appends must present recorded columns as an ordered prefix") {
    val csvLake = new DataLakehouse(spark, tempDir("schemaevo-csv2"), format = "csv")
    csvLake.ingestBatch(Seq(bar("AAPL", "2024-06-15 09:30:00")))
    csvLake.addColumn("venue", StringType)
    import spark.implicits._
    // old-shape producer (trailing omission of venue): sound, accepted
    csvLake.appendDF(Seq(bar("MSFT", "2024-06-15 10:30:00")).toDF())
    assert(csvLake.query().df.count() == 2)
    // a REORDERED batch would positionally misalign every later read —
    // rejected at the write
    val reordered = Seq(("2024-06-15 11:30:00", "GOOGL")).toDF("tsRaw", "symbol")
      .select($"symbol", to_timestamp($"tsRaw").as("timestamp"),
        lit(150.0).as("open"), lit(155.0).as("high"), lit(149.0).as("low"),
        lit(153.0).as("close"), lit(1000L).as("volume"),
        lit("XNAS").as("venue"), // venue BEFORE asset_class: middle insert
        lit("equity").as("asset_class"))
    val e = intercept[IllegalArgumentException] { csvLake.appendDF(reordered) }
    assert(e.getMessage.contains("csv append layout"))
  }

  test("csv append that ADDS a column while omitting a recorded one is rejected") {
    val csvLake = new DataLakehouse(spark, tempDir("schemaevo-csv3"), format = "csv")
    csvLake.ingestBatch(Seq(bar("AAPL", "2024-06-15 09:30:00")))
    csvLake.addColumn("venue", StringType)
    import spark.implicits._
    // batch omits venue (the LAST recorded data column) while adding
    // lot_size: the ordered-prefix check alone passes (known is a valid
    // prefix, the new column trails), yet the merged record would place
    // venue before lot_size while the file bytes have lot_size in
    // venue's position — lot_size values would read back AS venue.
    // A batch introducing columns must present the complete recorded
    // data schema first.
    val batch = Seq(("MSFT", ts("2024-06-15 10:30:00"), 150.0, 155.0, 149.0,
      153.0, 1000L, "equity", 100L))
      .toDF("symbol", "timestamp", "open", "high", "low", "close",
        "volume", "asset_class", "lot_size")
    val e = intercept[IllegalArgumentException] { csvLake.appendDF(batch) }
    assert(e.getMessage.contains("omitting recorded"))
    assert(csvLake.query().df.count() == 1) // nothing committed
  }

  test("append with a column differing only in CASE from a recorded one is rejected") {
    val lake = seeded()
    import spark.implicits._
    // 'Volume' vs recorded 'volume': under Spark's case-insensitive
    // resolution a second recorded field would make every later
    // fixed-schema read crash on a duplicate column — reject at the
    // write, like the DDL path does
    val batch = Seq(("NVDA", ts("2024-06-15 10:30:00"), 90.0, 95.0, 89.0,
      94.0, 500L, "equity"))
      .toDF("symbol", "timestamp", "open", "high", "low", "close",
        "Volume", "asset_class")
    val e = intercept[IllegalArgumentException] { lake.appendDF(batch) }
    assert(e.getMessage.contains("case-insensitive"))
    assert(lake.query().df.count() == 2) // nothing committed
  }

  test("a single batch carrying two NEW columns differing only in case is rejected") {
    val lake = seeded()
    import spark.implicits._
    // both columns are new, so neither hits the recorded-field checks —
    // recording both would plant the duplicate-column corruption directly
    val batch = Seq(("NVDA", ts("2024-06-15 10:30:00"), 90.0, 95.0, 89.0,
      94.0, 500L, "equity", "x", "y"))
      .toDF("symbol", "timestamp", "open", "high", "low", "close",
        "volume", "asset_class", "venue", "Venue")
    // either Spark's resolver (ambiguous reference during staging) or
    // the schema-merge guard rejects — both loud, neither commits
    val e = intercept[Exception] { lake.appendDF(batch) }
    assert(e.isInstanceOf[org.apache.spark.sql.AnalysisException] ||
      e.getMessage.contains("collide"), s"unexpected: $e")
    assert(lake.query().df.count() == 2) // nothing committed
  }

  test("compaction carries evolved columns through the rewrite") {
    val lake = seeded()
    lake.addColumn("venue", StringType)
    import spark.implicits._
    lake.appendDF(Seq(("NVDA", ts("2024-06-15 10:30:00"), 90.0, 95.0, 89.0,
      94.0, 500L, "equity", "XNAS"))
      .toDF("symbol", "timestamp", "open", "high", "low", "close",
        "volume", "asset_class", "venue"))
    lake.compact(maxFilesPerPartition = 0)
    val df = lake.query().df
    assert(df.count() == 3)
    assert(df.filter(col("venue") === "XNAS").count() == 1)
    assert(df.filter(col("venue").isNull).count() == 2)
  }

  test("addFiles rejects an external file that re-types a recorded column") {
    val lake = seeded()
    // an external parquet whose `volume` is DOUBLE where the table
    // records LONG: registration must fail HERE with the append-path
    // conflict message, not crash the vectorized reader at query time
    val extDir = s"${lake.root}/date=2024-06-17"
    lake.query().df.drop("date")
      .withColumn("timestamp",
        lit(java.sql.Timestamp.valueOf("2024-06-17 09:30:00")))
      .withColumn("volume", col("volume").cast("double"))
      .coalesce(1).write.mode("append").parquet(extDir)
    val rel = new java.io.File(extDir).listFiles()
      .map(_.getName).find(_.endsWith(".parquet"))
      .map(f => s"date=2024-06-17/$f").get
    val before = lake.txnLog.currentVersion()
    val e = intercept[IllegalArgumentException] { lake.addFiles(Seq(rel)) }
    assert(e.getMessage.contains("schema conflict"))
    assert(lake.txnLog.currentVersion() == before)
  }

  test("addFiles folds EVERY file's footer: conflict in a non-sampled file still rejected") {
    // ADVICE r13: schema inference without mergeSchema samples ONE
    // footer, so registering [conforming, re-typed] in one call let the
    // conflict ride into the table whenever the conforming file was the
    // sampled one — deferring the crash to the vectorized reader at
    // query time. With mergeSchema the cross-file conflict fails HERE
    // regardless of file order.
    val lake = seeded()
    val extDir = s"${lake.root}/date=2024-06-18"
    val base = lake.query().df.drop("date")
      .withColumn("timestamp",
        lit(java.sql.Timestamp.valueOf("2024-06-18 09:30:00")))
    // two files in one dir: one conforming, one re-typing `volume`
    base.coalesce(1).write.mode("append").parquet(extDir)
    base.withColumn("volume", col("volume").cast("double"))
      .coalesce(1).write.mode("append").parquet(extDir)
    val rels = new java.io.File(extDir).listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).sorted
      .map(f => s"date=2024-06-18/$f").toSeq
    assert(rels.size == 2)
    val before = lake.txnLog.currentVersion()
    // both orders: whichever file a single-footer sample would pick,
    // the merged inference must reject the pair
    Seq(rels, rels.reverse).foreach { rs =>
      val e = intercept[IllegalArgumentException] { lake.addFiles(rs) }
      assert(e.getMessage.contains("schema conflict"), s"unexpected: $e")
    }
    assert(lake.txnLog.currentVersion() == before)
  }
}
