package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.sources.DataLakehouse

/** SQL-text surface for managed-table statements (SqlDml): the DML and
  * utility forms a reference user coming from the SQL interactive tier
  * (README.md:30) runs as TEXT. Every statement must route to the SAME
  * engine op as the Scala API — these specs pin each form's routing,
  * its Delta-style metrics row, and the quote/paren-aware scanning that
  * keeps keywords inside string literals from splitting a statement.
  */
class SqlDmlSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def bar(sym: String, t: String, close: Double = 153.0): OhlcvBar =
    OhlcvBar(symbol = sym, timestamp = ts(t),
      open = 150.0, high = 155.0, low = 149.0, close = close,
      volume = 1000L, asset_class = AssetClass.Equity)

  /** Two date partitions x two symbols, 8 rows over two commits. */
  private def seeded(): DataLakehouse = {
    val lake = new DataLakehouse(spark, tempDir("sqldml"))
    lake.ingestBatch(Seq(
      bar("AAPL", "2024-06-15 09:30:00"), bar("AAPL", "2024-06-15 10:30:00"),
      bar("GOOGL", "2024-06-15 09:30:00"), bar("GOOGL", "2024-06-15 10:30:00")))
    lake.ingestBatch(Seq(
      bar("AAPL", "2024-06-16 09:30:00"), bar("AAPL", "2024-06-16 10:30:00"),
      bar("GOOGL", "2024-06-16 09:30:00"), bar("GOOGL", "2024-06-16 10:30:00")))
    lake
  }

  test("sql DELETE FROM ... WHERE routes to deleteWhere with metrics") {
    val lake = seeded()
    val m = lake.sql("DELETE FROM trades WHERE symbol = 'AAPL' AND date = '2024-06-15'")
    assert(m.columns.toSeq == Seq("num_affected_rows"))
    assert(m.head().getLong(0) == 2L)
    assert(lake.query().df.count() == 6)
    assert(lake.query().df.filter(col("symbol") === "AAPL" &&
      col("date") === "2024-06-15").isEmpty)
  }

  test("sql DELETE FROM without WHERE empties the table") {
    val lake = seeded()
    val m = lake.sql("DELETE FROM trades;")
    assert(m.head().getLong(0) == 8L)
    assert(lake.query().df.isEmpty)
  }

  test("sql UPDATE SET ... WHERE: commas inside calls and keywords inside literals") {
    val lake = seeded()
    // the SET list carries a function call with a comma AND a string
    // literal containing the words WHERE/AND — the scanner must split on
    // neither; volume arithmetic proves expressions see the OLD row
    val m = lake.sql(
      "UPDATE trades SET close = round(close + 0.5, 2), " +
        "symbol = 'X where , and Y', volume = volume + 1 " +
        "WHERE symbol = 'AAPL' AND date = '2024-06-16'")
    assert(m.columns.toSeq == Seq("num_updated_rows"))
    assert(m.head().getLong(0) == 2L)
    val updated = lake.query().df.filter(col("symbol") === "X where , and Y")
    assert(updated.count() == 2)
    assert(updated.select("close").collect().forall(_.getDouble(0) == 153.5))
    assert(updated.select("volume").collect().forall(_.getLong(0) == 1001L))
    // untouched rows keep their values
    assert(lake.query().df.filter(col("volume") === 1000L).count() == 6)
  }

  test("sql UPDATE: a backslash-escaped quote inside a literal never splits") {
    val lake = seeded()
    // Spark's default parser processes \' inside '...' — the scanner
    // must stay in quote state across it, or the comma after it would
    // end the literal early and shear the SET list
    val m = lake.sql(
      "UPDATE trades SET symbol = 'a\\',b', volume = volume + 1 " +
        "WHERE symbol = 'AAPL'")
    assert(m.head().getLong(0) == 4L)
    assert(lake.query().df.filter(col("symbol") === "a',b").count() == 4)
  }

  test("sql UPDATE without WHERE touches every row") {
    val lake = seeded()
    val m = lake.sql("UPDATE trades SET volume = volume * 2")
    assert(m.head().getLong(0) == 8L)
    assert(lake.query().df.select("volume").collect().forall(_.getLong(0) == 2000L))
  }

  test("sql MERGE INTO whole-row upsert form routes to merge") {
    val lake = seeded()
    import spark.implicits._
    Seq(
      bar("AAPL", "2024-06-15 09:30:00", close = 154.5), // replaces
      bar("MSFT", "2024-06-15 09:30:00")) // inserts
      .toDF().createOrReplaceTempView("src")
    val m = lake.sql(
      "MERGE INTO trades AS t USING src AS s " +
        "ON t.symbol = s.symbol AND t.timestamp = s.timestamp " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *")
    assert(m.columns.toSeq == Seq("num_updated_rows", "num_inserted_rows"))
    assert(m.head().getLong(0) == 1L && m.head().getLong(1) == 1L)
    val df = lake.query().df
    assert(df.count() == 9)
    assert(df.filter(col("symbol") === "MSFT").count() == 1)
    assert(df.filter(col("symbol") === "AAPL" &&
      col("timestamp") === ts("2024-06-15 09:30:00"))
      .head().getAs[Double]("close") == 154.5)
  }

  test("sql MERGE accepts bare (AS-less) aliases — the Delta idiom") {
    val lake = seeded()
    import spark.implicits._
    Seq(bar("MSFT", "2024-06-15 09:30:00"))
      .toDF().createOrReplaceTempView("src")
    val m = lake.sql(
      "MERGE INTO trades t USING src s " +
        "ON t.symbol = s.symbol AND t.timestamp = s.timestamp " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(m.head().getLong(1) == 1L) // MSFT inserted
    assert(lake.query().df.count() == 9)
  }

  test("sql UPDATE rejects duplicate SET targets; resolves names case-insensitively") {
    val lake = seeded()
    val e = intercept[IllegalArgumentException] {
      lake.sql("UPDATE trades SET close = 1, CLOSE = 2")
    }
    assert(e.getMessage.contains("duplicate SET"))
    val m = lake.sql("UPDATE trades SET Volume = volume + 5 WHERE symbol = 'AAPL'")
    assert(m.head().getLong(0) == 4L)
    assert(lake.query().df.filter(col("volume") === 1005L).count() == 4)
  }

  test("sql INSERT column list must include the core columns") {
    val lake = seeded()
    val e = intercept[IllegalArgumentException] {
      lake.sql("INSERT INTO trades (symbol, volume) VALUES ('X', 5)")
    }
    assert(e.getMessage.contains("core column"))
    assert(lake.query().df.count() == 8) // nothing written
  }

  test("sql MERGE rejects per-column WHEN clauses loudly") {
    val lake = seeded()
    val e = intercept[IllegalArgumentException] {
      lake.sql("MERGE INTO trades USING src ON trades.symbol = src.symbol " +
        "WHEN MATCHED THEN UPDATE SET close = src.close")
    }
    assert(e.getMessage.contains("unsupported MERGE form"))
  }

  test("sql MERGE rejects an ON term equating different columns") {
    val lake = seeded()
    import spark.implicits._
    Seq(bar("MSFT", "2024-06-15 09:30:00")).toDF()
      .createOrReplaceTempView("src")
    val e = intercept[IllegalArgumentException] {
      lake.sql("MERGE INTO trades USING src ON trades.symbol = src.asset_class " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    }
    assert(e.getMessage.contains("same column"))
  }

  test("sql INSERT INTO VALUES appends with positional cast") {
    val lake = seeded()
    val m = lake.sql(
      "INSERT INTO trades VALUES " +
        "('NVDA', timestamp'2024-06-17 09:30:00', 90.0, 95.0, 89.0, 94.0, 500, 'equity')")
    assert(m.columns.toSeq == Seq("num_inserted_rows"))
    assert(m.head().getLong(0) == 1L)
    val row = lake.query().df.filter(col("symbol") === "NVDA")
    assert(row.count() == 1)
    // date partition derived from timestamp, volume cast int->long
    assert(row.head().getAs[String]("date") == "2024-06-17")
    assert(row.head().getAs[Long]("volume") == 500L)
  }

  test("sql INSERT INTO SELECT appends from a view") {
    val lake = seeded()
    import spark.implicits._
    Seq(bar("TSLA", "2024-06-18 09:30:00"), bar("TSLA", "2024-06-18 10:30:00"))
      .toDF().createOrReplaceTempView("feed")
    val m = lake.sql(
      "INSERT INTO trades SELECT symbol, timestamp, open, high, low, close, volume, asset_class FROM feed")
    assert(m.head().getLong(0) == 2L)
    assert(lake.query().df.filter(col("symbol") === "TSLA").count() == 2)
  }

  test("sql INSERT arity mismatch is loud") {
    val lake = seeded()
    val e = intercept[IllegalArgumentException] {
      lake.sql("INSERT INTO trades VALUES ('NVDA', 1.0)")
    }
    assert(e.getMessage.contains("arity"))
  }

  test("sql OPTIMIZE compacts; DESCRIBE HISTORY and VACUUM RETAIN 0 HOURS work") {
    val lake = seeded()
    val filesBefore = lake.txnLog.snapshotFiles().size
    lake.sql("OPTIMIZE trades")
    val filesAfter = lake.txnLog.snapshotFiles().size
    assert(filesAfter <= filesBefore)
    assert(lake.query().df.count() == 8) // rewrite, not data change

    val hist = lake.sql("DESCRIBE HISTORY trades")
    assert(hist.count() == lake.txnLog.currentVersion() + 1)

    val vacuumed = lake.sql("VACUUM trades RETAIN 0 HOURS").head().getLong(0)
    assert(vacuumed >= filesBefore.toLong) // the compacted-away originals
    assert(lake.query().df.count() == 8)
  }

  test("sql VACUUM without RETAIN uses the 7-day default (deletes nothing fresh)") {
    val lake = seeded()
    lake.sql("OPTIMIZE trades")
    assert(lake.sql("VACUUM trades").head().getLong(0) == 0L)
  }

  test("sql INSERT OVERWRITE replaces the table in one atomic version") {
    val lake = seeded()
    val preVersion = lake.txnLog.currentVersion()
    val m = lake.sql(
      "INSERT OVERWRITE trades VALUES " +
        "('NVDA', timestamp'2024-06-17 09:30:00', 90.0, 95.0, 89.0, 94.0, 500, 'equity')")
    assert(m.head().getLong(0) == 1L)
    val df = lake.query().df
    assert(df.count() == 1)
    assert(df.head().getAs[String]("symbol") == "NVDA")
    // exactly one new version; pre-overwrite snapshot intact
    assert(lake.txnLog.currentVersion() == preVersion + 1)
    assert(lake.timeTravel(preVersion).count() == 8)
  }

  test("INSERT OVERWRITE: a concurrent blind append survives; a racing row op conflicts") {
    val lake = seeded()
    import spark.implicits._
    var fired = false
    lake.beforeDataCommit = () => if (!fired) {
      fired = true
      new DataLakehouse(spark, lake.root)
        .appendDF(Seq(bar("TSLA", "2024-06-17 09:30:00")).toDF())
    }
    lake.sql("INSERT OVERWRITE trades VALUES " +
      "('NVDA', timestamp'2024-06-17 10:30:00', 90.0, 95.0, 89.0, 94.0, 500, 'equity')")
    lake.beforeDataCommit = () => ()
    // WriteSerializable: the racing ingest's data is NOT destroyed
    val syms = lake.query().df.select("symbol").collect().map(_.getString(0)).sorted
    assert(syms.toSeq == Seq("NVDA", "TSLA"))

    // a row op rewriting a file of the snapshot being replaced conflicts
    var fired2 = false
    lake.beforeDataCommit = () => if (!fired2) {
      fired2 = true
      new DataLakehouse(spark, lake.root).deleteWhere(col("symbol") === "TSLA")
    }
    intercept[java.util.ConcurrentModificationException] {
      lake.sql("INSERT OVERWRITE trades VALUES " +
        "('AMD', timestamp'2024-06-17 11:30:00', 90.0, 95.0, 89.0, 94.0, 500, 'equity')")
    }
    lake.beforeDataCommit = () => ()
    assert(lake.query().df.filter(col("symbol") === "AMD").isEmpty)
  }

  test("sql RESTORE TABLE TO TIMESTAMP AS OF resolves by commit time") {
    val lake = seeded()
    Thread.sleep(5)
    val cut = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(5)
    lake.sql("DELETE FROM trades WHERE symbol = 'AAPL'")
    assert(lake.query().df.count() == 4)
    lake.sql(s"RESTORE TABLE trades TO TIMESTAMP AS OF '$cut'")
    assert(lake.query().df.count() == 8)
    // a timestamp predating all history names the problem, not a -1
    val e = intercept[IllegalArgumentException] {
      lake.sql("RESTORE TABLE trades TO TIMESTAMP AS OF '1970-01-02 00:00:00'")
    }
    assert(e.getMessage.contains("no version was committed"))
  }

  test("sql RESTORE TABLE TO VERSION AS OF rewinds") {
    val lake = seeded()
    val v = lake.txnLog.currentVersion()
    lake.sql("DELETE FROM trades WHERE symbol = 'AAPL'")
    assert(lake.query().df.count() == 4)
    val m = lake.sql(s"RESTORE TABLE trades TO VERSION AS OF $v")
    assert(m.columns.toSeq == Seq("version_restored"))
    assert(lake.query().df.count() == 8)
  }

  test("sql UPDATE re-validates CHECK constraints") {
    val lake = seeded()
    lake.addConstraint("vol_nonneg", "volume >= 0")
    val e = intercept[IllegalStateException] {
      lake.sql("UPDATE trades SET volume = -1 WHERE symbol = 'AAPL'")
    }
    assert(e.getMessage.contains("vol_nonneg"))
    // nothing committed
    assert(lake.query().df.filter(col("volume") < 0).isEmpty)
  }

  test("sql table_changes(start[, end]) composes inside SELECT (Delta CDF idiom)") {
    val lake = seeded() // v0, v1: two appends of 4 rows each
    lake.sql("DELETE FROM trades WHERE symbol = 'AAPL' AND date = '2024-06-15'") // v2
    // inclusive start, like Delta: version 1 alone is the second append
    val v1 = lake.sql(
      "SELECT count(*) AS n FROM table_changes(1, 1)").head().getLong(0)
    assert(v1 == 4L)
    // v2 is the copy-on-write delete: 2 deletes (net)
    val byType = lake.sql(
      "SELECT _change_type, count(*) AS n FROM table_changes(2, 2) GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("delete" -> 2L))
    // open-ended end defaults to the current version; composes with joins
    val joined = lake.sql(
      "SELECT count(*) AS n FROM table_changes('trades', 0) c " +
        "JOIN trades t ON c.symbol = t.symbol AND c.timestamp = t.timestamp " +
        "WHERE c._change_type = 'insert'")
      .head().getLong(0)
    assert(joined > 0L)
    val e = intercept[IllegalArgumentException] {
      lake.sql("SELECT * FROM table_changes('other', 0)")
    }
    assert(e.getMessage.contains("unknown table"))
    // the table argument is case-insensitive like every other reference
    assert(lake.sql("SELECT count(*) n FROM table_changes('TRADES', 2, 2)")
      .head().getLong(0) == 2L)
  }

  test("table_changes: literals untouched; composes with INSERT INTO SELECT") {
    val lake = seeded()
    // a string literal merely MENTIONING the TVF must never be rewritten
    val lit = lake.sql(
      "SELECT 'see table_changes(1, 2)' AS note FROM trades LIMIT 1")
      .head().getString(0)
    assert(lit == "see table_changes(1, 2)")
    // canonical CDF replay: the TVF must compose inside an intercepted
    // DML statement, not only inside plain SELECTs
    val m = lake.sql(
      "INSERT INTO trades SELECT symbol, timestamp, open, high, low, close, " +
        "volume, asset_class FROM table_changes(1, 1) " +
        "WHERE _change_type = 'insert'")
    assert(m.head().getLong(0) == 4L) // v1's appended rows, re-inserted
    assert(lake.query().df.count() == 12)
  }

  test("sql CREATE TABLE ... SHALLOW CLONE clones zero-copy, optionally pinned") {
    val lake = seeded()
    val v0 = lake.txnLog.currentVersion() - 1 // after the FIRST commit (4 rows)
    val loc1 = tempDir("clone-sql") + "/t1"
    val m = lake.sql(s"CREATE TABLE t1 SHALLOW CLONE trades LOCATION '$loc1'")
    assert(m.columns.toSeq == Seq("num_files_cloned"))
    val clone1 = new DataLakehouse(spark, loc1)
    assert(clone1.query().df.count() == 8)
    // version-pinned clone sees only the first commit
    val loc2 = tempDir("clone-sql") + "/t2"
    lake.sql(s"CREATE TABLE t2 SHALLOW CLONE trades VERSION AS OF $v0 LOCATION '$loc2'")
    assert(new DataLakehouse(spark, loc2).query().df.count() == 4)
    // clone and source are independent
    lake.sql("DELETE FROM trades")
    assert(clone1.query().df.count() == 8)
  }

  test("plain SELECT (and names merely PREFIXED by the table name) fall through") {
    val lake = seeded()
    val n = lake.sql("SELECT count(*) AS n FROM trades WHERE symbol = 'AAPL'")
      .head().getLong(0)
    assert(n == 4L)
    // a statement against a DIFFERENT table whose name shares the prefix
    // must not be intercepted (word-boundary check): Spark's own parser
    // sees it and fails with ITS table-not-found error, proving the
    // engine never routed it to deleteWhere
    val e = intercept[Exception] {
      lake.sql("DELETE FROM trades_backup WHERE true").collect()
    }
    assert(!e.isInstanceOf[IllegalArgumentException])
    assert(lake.query().df.count() == 8)
  }

  test("DESCRIBE HISTORY LIMIT n returns the newest n commits only") {
    val lake = seeded() // two commits: versions 0 and 1
    lake.sql("DELETE FROM trades WHERE symbol = 'AAPL' AND date = '2024-06-15'") // v2
    val limited = lake.sql("DESCRIBE HISTORY trades LIMIT 2")
    assert(limited.count() == 2)
    // newest-first, and exactly the tail window (Delta semantics) —
    // the windowed read must not replay the whole log to show it
    assert(limited.select("version").collect().map(_.getLong(0)).toSeq
      == Seq(2L, 1L))
    assert(lake.sql("DESCRIBE HISTORY trades").count() == 3)
  }

  test("INSERT ... SELECT FROM the table itself reads the CURRENT snapshot") {
    val lake = seeded()
    // a plain SELECT registers the table's temp view at THIS snapshot
    lake.sql("SELECT count(*) AS n FROM trades").collect()
    lake.sql("DELETE FROM trades WHERE symbol = 'AAPL'")
    // self-referencing INSERT: a stale view would re-insert the four
    // deleted AAPL rows; statement-start semantics must see the delete
    val m = lake.sql(
      "INSERT INTO trades SELECT symbol, timestamp, open, high, low, close, " +
        "volume, asset_class FROM trades WHERE symbol = 'AAPL'")
    assert(m.head().getLong(0) == 0L)
    assert(lake.query().df.filter(col("symbol") === "AAPL").isEmpty)
    assert(lake.query().df.count() == 4)
  }

  test("MERGE ... USING the table itself evaluates the source at the current snapshot") {
    val lake = seeded()
    lake.sql("SELECT count(*) AS n FROM trades").collect() // stale view
    lake.sql("DELETE FROM trades WHERE symbol = 'AAPL'")
    // source = the target table: with statement-start semantics this is
    // an idempotent self-upsert of the 4 surviving rows; a stale view
    // would resurrect the deleted AAPL rows as inserts
    val m = lake.sql(
      "MERGE INTO trades t USING trades s " +
        "ON t.symbol = s.symbol AND t.timestamp = s.timestamp " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    val row = m.head()
    assert(row.getLong(0) == 4L) // num_updated_rows
    assert(row.getLong(1) == 0L) // num_inserted_rows: no resurrection
    assert(lake.query().df.count() == 4)
    assert(lake.query().df.filter(col("symbol") === "AAPL").isEmpty)
  }

  test("table_changes views are root-scoped: two lakes, same table name, no clobber") {
    val lakeA = seeded()
    val lakeB = new DataLakehouse(spark, tempDir("sqldml-otherroot"))
    lakeB.ingestBatch(Seq(bar("MSFT", "2024-06-15 09:30:00")))
    lakeB.ingestBatch(Seq(bar("NVDA", "2024-06-16 09:30:00"))) // version 1
    // identical table name AND identical version range: without a
    // root discriminator both statements materialize the SAME view name
    val aN = lakeA.sql("SELECT count(*) AS n FROM table_changes(1, 1)")
      .head().getLong(0)
    val bN = lakeB.sql("SELECT count(*) AS n FROM table_changes(1, 1)")
      .head().getLong(0)
    assert(aN == 4L)
    assert(bN == 1L)
    // the two registrations coexist under distinct names — B's never
    // replaced A's, so a concurrent reader of A's feed cannot be served
    // B's rows
    val views = spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith("graft_changes_trades"))
    assert(views.distinct.length >= 2, s"expected root-scoped views, got ${views.mkString(",")}")
  }

  test("a string literal mentioning the AS OF pin is neither a pin nor rewritten") {
    val lake = seeded() // v0 = 4 rows, head (v1) = 8 rows
    val l = "trades FOR VERSION AS OF 0"
    // quote-blind matching would pin the statement to v0 (4 rows) AND
    // mangle the literal to 'trades' — quote-aware handling reads the
    // head and leaves the literal intact, so the tautology holds over
    // all 8 rows
    val n = lake.sql(s"SELECT count(*) AS n FROM trades WHERE '$l' = '$l'")
      .collect()(0).getLong(0)
    assert(n == 8)
    // and a REAL pin still works alongside the quote-awareness
    val pinned = lake.sql(
      "SELECT count(*) AS n FROM trades FOR VERSION AS OF 0")
      .collect()(0).getLong(0)
    assert(pinned == 4)
  }
}
