package graft.sources

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.{AssetClass, OhlcvBar, SparkSpec}

/** Statement-level fuzz over the SqlDml interceptor — the layer above
  * [[SqlScannerPropSpec]]'s split/search pins. Two failure classes a
  * keyword-routed statement scanner can leak forever:
  *
  *   1. FALSE INTERCEPTION: pass-through text (a SELECT whose literals
  *      merely mention DML keywords, a statement against a table whose
  *      name shares the prefix) routed to an engine op. 1000 generated
  *      pass-through statements assert `intercept == None` AND
  *      `rewriteTableChanges == identity` — the statement must reach
  *      Spark byte-for-byte untouched.
  *   2. MISSED/MIS-ROUTED RECOGNITION under surface variation: every
  *      recognized form, fuzzed over keyword casing, whitespace shape
  *      (spaces/tabs/newlines), and the optional trailing `;`, must
  *      still route to the SAME engine op — asserted through each op's
  *      distinguishing metrics column and its effect on a real lake.
  *
  * Raw ScalaCheck from fixed seeds (the scalatest bridge isn't in the
  * offline cache) — the PropertySpec pattern.
  */
class SqlDmlFuzzSpec extends SparkSpec {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default.withSize(40), Seed(seed))
      .getOrElse(sys.error("gen failed"))

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def bar(sym: String, t: String): OhlcvBar =
    OhlcvBar(symbol = sym, timestamp = ts(t),
      open = 150.0, high = 155.0, low = 149.0, close = 153.0,
      volume = 1000L, asset_class = AssetClass.Equity)

  private def seeded(): DataLakehouse = {
    val lake = new DataLakehouse(spark, tempDir("sqlfuzz"))
    lake.ingestBatch(Seq(
      bar("AAPL", "2024-06-15 09:30:00"), bar("GOOGL", "2024-06-15 09:30:00")))
    lake
  }

  // ------------------------------------------------- 1. false interception

  /** Fragments that LOOK like DML but must never be intercepted: every
    * keyword form buried in a string literal (all three quote styles,
    * escapes), table names that merely share the prefix, and the DML
    * words as harmless aliases/projections.
    */
  private val passThroughAtom: Gen[String] = Gen.oneOf(
    Gen.const("'DELETE FROM trades WHERE 1=1'"),
    Gen.const("'UPDATE trades SET x = 1'"),
    Gen.const("'MERGE INTO trades USING s ON a = b'"),
    Gen.const("'INSERT INTO trades VALUES (1)'"),
    Gen.const("'OPTIMIZE trades'"),
    Gen.const("'VACUUM trades RETAIN 0 HOURS'"),
    Gen.const("'DESCRIBE HISTORY trades'"),
    Gen.const("'RESTORE TABLE trades TO VERSION AS OF 0'"),
    Gen.const("'ALTER TABLE trades ADD COLUMN x INT'"),
    Gen.const("'CREATE TABLE x SHALLOW CLONE trades LOCATION ''/t'''"),
    Gen.const("'see table_changes(1, 2) for the feed'"),
    Gen.const("\"table_changes(0)\""),
    Gen.const("`delete from trades`"),
    Gen.const("'esc\\' delete from trades'"),
    Gen.const("trades_backup"),
    Gen.const("trades_v2.symbol"),
    Gen.const("updates"),       // bare word sharing a keyword prefix
    Gen.const("inserted_at"),
    Gen.const("optimizer_hint"),
    Gen.identifier.map(_.take(8)),
    Gen.const("count(*) AS delete_count"),
    Gen.const("max(close) AS merge_high"))

  private val passThroughStmt: Gen[String] = for {
    n <- Gen.choose(1, 5)
    atoms <- Gen.listOfN(n, passThroughAtom)
    tail <- Gen.oneOf("", " WHERE symbol = 'AAPL'", " ORDER BY 1", " LIMIT 3")
  } yield s"SELECT ${atoms.mkString(", ")} FROM trades$tail"

  test("1000 pass-through statements: never intercepted, rewrite == identity") {
    val lake = seeded()
    val v0 = lake.txnLog.currentVersion()
    (1L to 1000L).foreach { s =>
      val text = sample(passThroughStmt, s)
      assert(SqlDml.intercept(lake, text, "trades").isEmpty,
        s"seed=$s falsely intercepted: $text")
      assert(SqlDml.rewriteTableChanges(lake, text, "trades") == text,
        s"seed=$s rewrite not identity: $text")
    }
    // statements that DO start with a DML keyword but target a table
    // merely sharing the name's prefix must fall through too (the
    // word-boundary pin, fuzzed over suffixes)
    val suffix = Gen.oneOf("_backup", "2", "x", "_v2.part")
    (1L to 100L).foreach { s =>
      val sfx = sample(suffix, s)
      val stmts = Seq(
        s"DELETE FROM trades$sfx WHERE true",
        s"UPDATE trades$sfx SET a = 1",
        s"MERGE INTO trades$sfx USING s ON a = b",
        s"INSERT INTO trades$sfx VALUES (1)",
        s"OPTIMIZE trades$sfx",
        s"VACUUM trades$sfx",
        s"DESCRIBE HISTORY trades$sfx",
        s"RESTORE TABLE trades$sfx TO VERSION AS OF 0",
        s"ALTER TABLE trades$sfx ADD COLUMN x INT")
      stmts.foreach { t =>
        assert(SqlDml.intercept(lake, t, "trades").isEmpty,
          s"seed=$s prefix-table statement intercepted: $t")
      }
    }
    // and none of the 1100 touched the log
    assert(lake.txnLog.currentVersion() == v0)
  }

  // --------------------------------- 2. recognition under surface variation

  /** Randomize the CASING of every letter and stretch each single space
    * into random whitespace (space/tab/newline runs); optionally append
    * `;`. Literals in our templates are whitespace-free and quoted
    * segments carry no spaces, so the transform never alters semantics.
    */
  private def mangle(stmt: String, seed: Long): String = {
    val rnd = new scala.util.Random(seed)
    val sb = new StringBuilder
    var quoted = false
    stmt.foreach { c =>
      if (c == '\'') { quoted = !quoted; sb.append(c) }
      else if (quoted) sb.append(c)
      else if (c.isLetter)
        sb.append(if (rnd.nextBoolean()) c.toUpper else c.toLower)
      else if (c == ' ') {
        val ws = Seq(" ", "  ", "\t", "\n", " \t ")(rnd.nextInt(5))
        sb.append(ws)
      } else sb.append(c)
    }
    if (rnd.nextBoolean()) sb.append(" ;") else ()
    sb.toString
  }

  test("every statement form survives casing/whitespace mangling and routes to its op") {
    val lake = seeded()
    // src view for MERGE / INSERT SELECT
    lake.query().df.createOrReplaceTempView("fuzz_src")
    val cloneBase = tempDir("sqlfuzz-clone")
    // (template, expected metrics columns) — the column set identifies
    // the routed op; effects are additionally spot-checked below
    // Round shape: the DML/utility forms run against the PRISTINE core
    // schema (whole-row MERGE demands source columns == target columns,
    // so it must never see a half-evolved target), then the round's ADD
    // COLUMN lands and is asserted, then RESTORE TO VERSION 0 rewinds
    // the schema for the next round — which also fuzzes restore itself.
    def run(i: Int, j: Int, template: String, cols: Seq[String]): Unit = {
      val mangled = mangle(template, i * 100L + j)
      val out = SqlDml.intercept(lake, mangled, "trades")
      assert(out.isDefined, s"not recognized (i=$i): $mangled")
      assert(out.get.columns.toSeq == cols,
        s"mis-routed (i=$i): $mangled -> ${out.get.columns.mkString(",")}")
    }
    (1 to 8).foreach { i =>
      run(i, 0, "DELETE FROM trades WHERE symbol = 'NOPE'",
        Seq("num_affected_rows"))
      run(i, 1, "UPDATE trades SET volume = volume WHERE symbol = 'NOPE'",
        Seq("num_updated_rows"))
      run(i, 2, "MERGE INTO trades t USING fuzz_src s ON t.symbol = s.symbol " +
        "AND t.timestamp = s.timestamp WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *",
        Seq("num_updated_rows", "num_inserted_rows"))
      run(i, 3, "INSERT INTO trades SELECT symbol, timestamp, open, high, " +
        "low, close, volume, asset_class FROM fuzz_src WHERE symbol = 'NOPE'",
        Seq("num_inserted_rows"))
      run(i, 4, "OPTIMIZE trades", Seq("version_committed"))
      run(i, 5, "VACUUM trades RETAIN 9999 HOURS", Seq("num_files_deleted"))
      run(i, 6, s"CREATE TABLE c SHALLOW CLONE trades LOCATION '$cloneBase/c$i'",
        Seq("num_files_cloned"))
      // DESCRIBE HISTORY routes to history() (its schema is the history
      // table's, not a metric — presence of `version` suffices)
      val hist = SqlDml.intercept(lake,
        mangle("DESCRIBE HISTORY trades", i * 991L), "trades")
      assert(hist.isDefined && hist.get.columns.contains("version"))
      // schema round-trip: ADD COLUMN lands (name casing is itself
      // fuzzed — SQL identifiers compare case-insensitively) ...
      run(i, 7, "ALTER TABLE trades ADD COLUMN " + s"fz_$i" + " INT",
        Seq("version_committed"))
      assert(lake.dataSchema.exists(_.name.equalsIgnoreCase(s"fz_$i")),
        s"round $i: fz_$i not recorded")
      // ... and RESTORE rewinds it, leaving the next round pristine
      run(i, 8, "RESTORE TABLE trades TO VERSION AS OF 0",
        Seq("version_restored"))
      assert(!lake.dataSchema.exists(_.name.equalsIgnoreCase(s"fz_$i")),
        s"round $i: restore did not rewind fz_$i")
    }
    // effect spot-checks: the no-op predicates really were no-ops and
    // the final restore kept the original rows readable
    assert(lake.query().df.count() == 2)
  }
}
