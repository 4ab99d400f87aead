package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit}

/** SQL-text surface for the lakehouse's MANAGED-table statements — the
  * commands Spark's parser cannot route through a temp view (DML and
  * table utilities act on the txn log, not on a registered relation).
  * [[DataLakehouse.sql]] calls [[intercept]] before handing the text to
  * Spark; a recognized statement routes to the corresponding engine op
  * and returns a Delta-style metrics DataFrame, anything else falls
  * through to the snapshot-view path untouched.
  *
  * Statement forms (case-insensitive, `;` optional, Delta syntax where
  * Delta defines one — the reference's own interactive tier is plain
  * SQL, README.md:30, so the switch-over story needs these to exist as
  * TEXT, not only as Scala calls):
  *
  *   - `DELETE FROM t [WHERE cond]`                  → [[DataLakehouse.deleteWhere]]
  *   - `UPDATE t SET c = e, ... [WHERE cond]`        → [[DataLakehouse.update]]
  *   - `MERGE INTO t USING s ON t.k = s.k [AND ...]
  *      WHEN MATCHED THEN UPDATE SET *
  *      WHEN NOT MATCHED THEN INSERT *`              → [[DataLakehouse.merge]]
  *   - `INSERT INTO t [(cols)] VALUES (...), ...` /
  *     `INSERT INTO t [(cols)] SELECT ...`           → [[DataLakehouse.appendDF]]
  *   - `INSERT OVERWRITE [TABLE] t …`                → [[DataLakehouse.overwriteDF]]
  *   - `OPTIMIZE t`                                  → [[DataLakehouse.compact]]
  *   - `VACUUM t [RETAIN n HOURS]`                   → [[DataLakehouse.vacuum]]
  *   - `DESCRIBE HISTORY t [LIMIT n]`                → [[DataLakehouse.history]]
  *   - `RESTORE TABLE t TO VERSION AS OF n` /
  *     `… TO TIMESTAMP AS OF 'ts'`                   → [[DataLakehouse.restore]]
  *   - `ALTER TABLE t ADD COLUMN[S] … / DROP COLUMN` → schema evolution DDL
  *   - `CREATE TABLE x SHALLOW CLONE t [VERSION AS OF n]
  *      LOCATION 'path'`                             → [[DataLakehouse.cloneTo]]
  *
  * MERGE accepts exactly the whole-row upsert form above (the Delta
  * idiom `UPDATE SET * / INSERT *`): that is what the engine's merge
  * implements — per-column WHEN clauses raise a loud unsupported error
  * rather than silently approximating. WHERE/SET/ON text is parsed with
  * a quote- and paren-aware scanner, so string literals containing
  * keywords (`WHERE note = 'and where'`) never split a statement.
  *
  * Conditions resolve against the table's own columns (unqualified
  * names, as in `deleteWhere`); subqueries inside a DML condition are
  * not supported — they would need Spark's analyzer against the
  * snapshot view, at which point the read belongs in `sql`'s SELECT
  * path feeding a `merge`.
  */
private[sources] object SqlDml {

  /** Rewrite every UNQUOTED `table_changes(['t',] start[, end])` call
    * in `text` to a materialized temp view of [[DataLakehouse.changes]]
    * (Delta's CDF TVF idiom — Spark's registry has no such TVF over
    * this log). Quote-aware via [[scanMask]]: a string literal that
    * merely mentions table_changes is left untouched. View names are
    * table-scoped (`graft_changes_<table>_<start>_<end>`) so two lakes
    * sharing one SparkSession cannot clobber each other's feed. Delta's
    * start is INCLUSIVE; [[DataLakehouse.changes]] is exclusive-from,
    * hence start-1.
    */
  private[sources] def rewriteTableChanges(lake: DataLakehouse, text: String,
      tableName: String): String = {
    val tcRe = ("(?i)\\btable_changes\\s*\\(\\s*(?:'([^']*)'\\s*,\\s*)?" +
      "(\\d+)\\s*(?:,\\s*(\\d+))?\\s*\\)").r
    val ms = tcRe.findAllMatchIn(text).toSeq
    if (ms.isEmpty) return text
    val (quoted, _) = scanMask(text)
    val sb = new StringBuilder
    var last = 0
    ms.foreach { m =>
      if (m.start >= last && !quoted(m.start)) {
        Option(m.group(1)).foreach { n =>
          require(n.equalsIgnoreCase(tableName),
            s"table_changes: unknown table '$n' " +
              s"(this registry serves '$tableName')")
        }
        val start = m.group(2).toLong
        val end = Option(m.group(3)).map(_.toLong)
          .getOrElse(lake.txnLog.currentVersion())
        val safe = tableName.replaceAll("[^A-Za-z0-9_]", "_")
        // Root-derived discriminator: two lakes over DIFFERENT roots
        // registered under the SAME table name in one SparkSession must
        // not serve each other's change feed for equal version ranges —
        // table-scoping alone does not separate them. First 16 hex chars
        // of SHA-256 over the root path: 64 collision-resistant bits
        // (32-bit String.hashCode collides at ~77k distinct roots by
        // birthday bound — a collision would re-open the cross-serving
        // bug this tag exists to close).
        val rootTag = java.security.MessageDigest.getInstance("SHA-256")
          .digest(lake.root.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          .take(8).map(b => f"$b%02x").mkString
        val view = s"graft_changes_${safe}_${rootTag}_${start}_$end"
        lake.changes(start - 1, end).createOrReplaceTempView(view)
        sb.append(text.substring(last, m.start)).append(view)
        last = m.end
      }
    }
    sb.append(text.substring(last))
    sb.toString
  }

  /** Try to parse `text` as a managed-table statement against table
    * `tableName`; None = not a DML/utility statement (caller falls
    * through to the view path).
    */
  def intercept(lake: DataLakehouse, text: String,
      tableName: String): Option[DataFrame] = {
    val spark = lake.spark
    val t = java.util.regex.Pattern.quote(tableName)

    val deleteRe = s"(?is)^\\s*DELETE\\s+FROM\\s+$t\\b(.*)$$".r
    val updateRe = s"(?is)^\\s*UPDATE\\s+$t\\s+SET\\b(.*)$$".r
    val mergeRe = s"(?is)^\\s*MERGE\\s+INTO\\s+$t\\b(.*)$$".r
    val insertRe = s"(?is)^\\s*INSERT\\s+INTO\\s+$t\\b(.*)$$".r
    val overwriteRe =
      s"(?is)^\\s*INSERT\\s+OVERWRITE\\s+(?:TABLE\\s+)?$t\\b(.*)$$".r
    val optimizeRe = s"(?is)^\\s*OPTIMIZE\\s+$t\\s*;?\\s*$$".r
    val vacuumRe =
      s"(?is)^\\s*VACUUM\\s+$t(?:\\s+RETAIN\\s+(\\d+)\\s+HOURS?)?\\s*;?\\s*$$".r
    // LIMIT digit run length-guarded so toLong cannot overflow
    val historyRe =
      s"(?is)^\\s*DESCRIBE\\s+HISTORY\\s+$t(?:\\s+LIMIT\\s+(\\d{1,18}))?\\s*;?\\s*$$".r
    val restoreRe =
      s"(?is)^\\s*RESTORE\\s+TABLE\\s+$t\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*$$".r
    val restoreTsRe =
      s"(?is)^\\s*RESTORE\\s+TABLE\\s+$t\\s+TO\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'\\s*;?\\s*$$".r
    // Delta clone syntax, with LOCATION carrying the new table's root
    // (this registry is path-based — there is no catalog to CREATE into)
    val cloneRe =
      (s"(?is)^\\s*CREATE\\s+TABLE\\s+[\\w.]+\\s+SHALLOW\\s+CLONE\\s+$t" +
        "(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+))?\\s+LOCATION\\s+'([^']+)'\\s*;?\\s*$$").r
    // schema-evolution DDL (Delta syntax): single- and multi-column ADD,
    // name-only DROP. Types parse through DataType.fromDDL, so the full
    // SQL type grammar (DECIMAL(10,2), ARRAY<DOUBLE>, ...) is accepted.
    val addColRe =
      s"(?is)^\\s*ALTER\\s+TABLE\\s+$t\\s+ADD\\s+COLUMN\\s+(\\w+)\\s+(.+?)\\s*;?\\s*$$".r
    val addColsRe =
      s"(?is)^\\s*ALTER\\s+TABLE\\s+$t\\s+ADD\\s+COLUMNS\\s*\\((.+)\\)\\s*;?\\s*$$".r
    val dropColRe =
      s"(?is)^\\s*ALTER\\s+TABLE\\s+$t\\s+DROP\\s+COLUMN\\s+(\\w+)\\s*;?\\s*$$".r

    text match {
      case addColRe(name, ddlType) =>
        return Some(metric(spark, "version_committed",
          lake.addColumn(name,
            org.apache.spark.sql.types.DataType.fromDDL(ddlType))))
      case addColsRe(list) =>
        // the list is itself DDL ("c1 INT, c2 STRING"): one parse, ONE
        // atomic commit for the whole list
        val fields = org.apache.spark.sql.types.StructType.fromDDL(list)
        return Some(metric(spark, "version_committed",
          lake.addColumns(fields.map(f => f.name -> f.dataType))))
      case dropColRe(name) =>
        // SQL identifiers are case-insensitive: resolve to the schema's
        // spelling before the exact-name Scala API
        val canonical = lake.dataSchema
          .find(_.name.equalsIgnoreCase(name)).map(_.name).getOrElse(name)
        return Some(metric(spark, "version_committed",
          lake.dropColumn(canonical)))
      case _ => ()
    }

    text match {
      case deleteRe(rest) => Some(delete(lake, rest))
      case updateRe(rest) => Some(update(lake, rest))
      case mergeRe(rest) => Some(merge(lake, tableName, rest))
      case insertRe(rest) =>
        Some(insert(lake, tableName, rest, overwrite = false))
      case overwriteRe(rest) =>
        Some(insert(lake, tableName, rest, overwrite = true))
      case optimizeRe() =>
        val v = lake.compact(maxFilesPerPartition = 0)
        Some(metric(spark, "version_committed", v))
      case vacuumRe(hours) =>
        val retain = Option(hours).map(_.toLong * 3600 * 1000L)
          .getOrElse(DataLakehouse.DefaultVacuumRetainMs)
        Some(metric(spark, "num_files_deleted", lake.vacuum(retain)))
      case historyRe(limit) => Some(lake.history(
        Option(limit).map(_.toLong).getOrElse(Long.MaxValue)))
      case restoreRe(v) =>
        Some(metric(spark, "version_restored", lake.restore(v.toLong)))
      case restoreTsRe(ts) =>
        Some(metric(spark, "version_restored",
          lake.restore(java.sql.Timestamp.valueOf(ts))))
      case cloneRe(version, location) =>
        val clone = lake.cloneTo(location,
          Option(version).map(_.toLong).getOrElse(Long.MaxValue))
        Some(metric(spark, "num_files_cloned",
          clone.txnLog.snapshotFiles().size.toLong))
      case _ => None
    }
  }

  private def metric(spark: SparkSession, name: String, v: Long): DataFrame = {
    import spark.implicits._
    Seq(v).toDF(name)
  }

  private def stripSemi(s: String): String = {
    val t = s.trim
    if (t.endsWith(";")) t.dropRight(1).trim else t
  }

  private def delete(lake: DataLakehouse, rest: String): DataFrame = {
    val r = stripSemi(rest)
    val cond =
      if (r.isEmpty) lit(true)
      else {
        val m = "(?is)^WHERE\\b(.+)$".r.findFirstMatchIn(r)
          .getOrElse(throw new IllegalArgumentException(
            s"malformed DELETE tail: '$r' (expected [WHERE cond])"))
        expr(m.group(1).trim)
      }
    metric(lake.spark, "num_affected_rows", lake.deleteWhere(cond))
  }

  private def update(lake: DataLakehouse, rest: String): DataFrame = {
    val r = stripSemi(rest)
    // the SET list runs until the first TOP-LEVEL `WHERE` (an assignment
    // expression may contain the word inside a string literal or a
    // parenthesized expression — the scanner skips both)
    val (setPart, wherePart) = topLevelKeyword(r, "WHERE") match {
      case Some(i) => (r.substring(0, i), Some(r.substring(i + 5)))
      case None => (r, None)
    }
    val target = lake.dataSchema
    val assignments = splitTopLevel(setPart, ',').map { seg =>
      val eq = seg.indexOf('=')
      require(eq > 0, s"malformed SET assignment: '${seg.trim}'")
      val name = seg.substring(0, eq).trim
      require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"malformed SET column name: '$name'")
      // canonicalize case to the schema's spelling (SQL identifiers are
      // case-insensitive; the Scala API stays exact) — unknown names
      // pass through for lake.update's own loud check
      val canonical =
        target.find(_.name.equalsIgnoreCase(name)).map(_.name).getOrElse(name)
      canonical -> expr(seg.substring(eq + 1).trim)
    }
    // standard SQL rejects a duplicate assignment target; a silent
    // toMap would keep only the last and execute a typo'd statement
    // with different semantics
    val dup = assignments.map(_._1).groupBy(identity).filter(_._2.size > 1).keys
    require(dup.isEmpty,
      s"duplicate SET assignment target(s): ${dup.mkString(", ")}")
    val cond = wherePart.map(w => expr(w.trim)).getOrElse(lit(true))
    metric(lake.spark, "num_updated_rows",
      lake.update(cond, assignments.toMap))
  }

  private def merge(lake: DataLakehouse, tableName: String,
      rest: String): DataFrame = {
    val spark = lake.spark
    // aliases accept both `AS x` and the bare `x` form (standard SQL
    // makes AS optional; Delta examples use the bare form)
    val form =
      ("(?is)^(?:\\s+(?:AS\\s+)?(\\w+))?\\s+USING\\s+([\\w.]+)(?:\\s+(?:AS\\s+)?(\\w+))?" +
        "\\s+ON\\b(.+?)" +
        "\\s+WHEN\\s+MATCHED\\s+THEN\\s+UPDATE\\s+SET\\s+\\*" +
        "\\s+WHEN\\s+NOT\\s+MATCHED\\s+THEN\\s+INSERT\\s+\\*\\s*;?\\s*$").r
    val m = form.findFirstMatchIn(rest).getOrElse(
      throw new IllegalArgumentException(
        "unsupported MERGE form — the engine implements the whole-row " +
          "upsert: MERGE INTO t USING s ON t.k = s.k [AND ...] " +
          "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * " +
          "(per-column WHEN clauses / DELETE clauses are not supported)"))
    val targetAlias = Option(m.group(1)).getOrElse(tableName)
    val sourceName = m.group(2)
    val sourceAlias = Option(m.group(3)).getOrElse(sourceName)
    val onClause = m.group(4)
    // ON must be a conjunction of cross-side equalities on the SAME
    // column name — that is the key set merge() joins on
    val keys = splitTopLevelWord(onClause, "AND").map { conj =>
      val eqRe = "(?is)^\\s*([\\w.]+)\\s*=\\s*([\\w.]+)\\s*$".r
      val e = eqRe.findFirstMatchIn(conj).getOrElse(
        throw new IllegalArgumentException(
          s"unsupported MERGE ON term: '${conj.trim}' " +
            "(expected t.col = s.col equality)"))
      def split(q: String): (Option[String], String) = {
        val i = q.lastIndexOf('.')
        if (i < 0) (None, q) else (Some(q.substring(0, i)), q.substring(i + 1))
      }
      val (qa, ca) = split(e.group(1))
      val (qb, cb) = split(e.group(2))
      require(ca.equalsIgnoreCase(cb),
        s"MERGE ON must equate the same column on both sides, got " +
          s"'${e.group(1)} = ${e.group(2)}'")
      val quals = Set(qa, qb).flatten.map(_.toLowerCase(java.util.Locale.ROOT))
      val known = Set(targetAlias, sourceAlias, tableName, sourceName)
        .map(_.toLowerCase(java.util.Locale.ROOT))
      require(quals.forall(known.contains),
        s"unknown qualifier in MERGE ON term '${conj.trim}' " +
          s"(expected one of ${known.mkString(", ")})")
      ca
    }
    // The USING source may reference the target table itself (or a view
    // over it). Delta evaluates the source against the CURRENT snapshot
    // at statement start — an earlier sql() SELECT may have left a STALE
    // temp view registered under the table's name, so refresh it first
    // (the fall-through path in DataLakehouse.sql does the same).
    refreshTableView(lake, tableName)
    val (updated, inserted) = lake.merge(spark.table(sourceName), keys)
    import spark.implicits._
    Seq((updated, inserted)).toDF("num_updated_rows", "num_inserted_rows")
  }

  /** Re-register the table's temp view over the CURRENT snapshot — the
    * read-at-statement-start semantics DML sources need. Without this, a
    * self-referencing `INSERT INTO t SELECT … FROM t` or `MERGE … USING
    * t` would silently read whatever snapshot an earlier sql() SELECT
    * happened to register (e.g. re-inserting rows deleted since).
    */
  private def refreshTableView(lake: DataLakehouse,
      tableName: String): Unit =
    lake.query().df.createOrReplaceTempView(tableName)

  private def insert(lake: DataLakehouse, tableName: String, rest: String,
      overwrite: Boolean): DataFrame = {
    val spark = lake.spark
    val r0 = stripSemi(rest)
    // optional explicit column list `(c1, c2, ...)` before VALUES/SELECT
    // — disambiguated from a parenthesized SELECT by shape (a comma list
    // of bare identifiers); unnamed columns fill with NULL
    val (colNames, r) =
      if (r0.startsWith("(")) {
        val close = matchingParen(r0)
        val names = splitTopLevel(r0.substring(1, close), ',').map(_.trim)
        if (names.nonEmpty &&
          names.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")))
          (Some(names), r0.substring(close + 1).trim)
        else (None, r0)
      } else (None, r0)
    val src =
      if (r.toUpperCase.startsWith("VALUES")) spark.sql(s"SELECT * FROM $r")
      else if (r.toUpperCase.startsWith("SELECT") ||
        r.toUpperCase.startsWith("(")) {
        // SELECT sources may reference the target table — evaluate them
        // against the current snapshot, not a stale registered view
        refreshTableView(lake, tableName)
        spark.sql(r)
      }
      else throw new IllegalArgumentException(
        s"malformed INSERT tail: '${r.take(40)}' (expected VALUES or SELECT)")
    // positional mapping (SQL INSERT semantics) onto the supplied column
    // list or the full data schema, then cast to the live schema's types
    // — `date` is derived by appendDF, never supplied
    val target = lake.dataSchema
    val supplied = colNames.getOrElse(target.map(_.name))
    colNames.foreach { ns =>
      val unknown = ns.filterNot(n =>
        target.exists(_.name.equalsIgnoreCase(n)))
      require(unknown.isEmpty,
        s"unknown INSERT column(s): ${unknown.mkString(", ")}")
      require(ns.map(_.toLowerCase(java.util.Locale.ROOT)).distinct.size == ns.size,
        s"duplicate INSERT column in (${ns.mkString(", ")})")
      // NULL-fill is for nullable EVOLVED columns only: a NULL core
      // column would bypass the ingest validation tier (null timestamp
      // → null date partition key → a row that range pruning can never
      // see again; null symbol/prices likewise break the model's
      // invariants silently)
      val missingCore = graft.model.ohlcvSchema.fieldNames
        .filterNot(c => ns.exists(_.equalsIgnoreCase(c)))
      require(missingCore.isEmpty,
        s"INSERT column list must include the core column(s): " +
          missingCore.mkString(", "))
    }
    require(src.columns.length == supplied.length,
      s"INSERT arity ${src.columns.length} != column-list arity " +
        s"${supplied.length} (${supplied.mkString(", ")})")
    // canonicalize the user's spelling to the schema's (names are
    // validated above, so the find always hits for a column list)
    val canonical = supplied.map(n =>
      target.find(_.name.equalsIgnoreCase(n)).map(_.name).getOrElse(n))
    val renamed = src.toDF(canonical: _*)
    val complete = renamed.select(target.map { f =>
      (if (canonical.contains(f.name)) col(f.name)
       else lit(null)).cast(f.dataType).as(f.name)
    }: _*).persist()
    // persist so the metric count and the write observe the SAME rows —
    // a non-deterministic source (rand(), a view over changing data)
    // would otherwise be computed twice and the reported count could
    // diverge from what was written
    try {
      val n = complete.count()
      if (overwrite) lake.overwriteDF(complete) else lake.appendDF(complete)
      metric(spark, "num_inserted_rows", n)
    } finally complete.unpersist(blocking = false)
  }

  // ------------------------------------------------------------- scanning
  //
  // Minimal SQL-aware scanner: ONE character walk ([[scanMask]]) computes
  // quoted-run membership ('...'/"..."/`...`, doubled-quote escapes,
  // backslash escapes in the string forms — the grammar Spark's default
  // parser accepts) and paren depth; every split/search primitive reads
  // the shared mask, so an escaping fix lands in exactly one place.

  /** Quoted-run membership per character — DataLakehouse.sql's AS OF pin
    * stripper reads it so `FOR VERSION/TIMESTAMP AS OF` inside a string
    * literal is never treated as a pin (the same guarantee
    * [[rewriteTableChanges]] carries for table_changes).
    */
  private[sources] def quotedMask(s: String): Array[Boolean] = scanMask(s)._1

  /** Per-character (insideQuotedRun, parenDepth) for `s`. Depth
    * convention: an opening `(` carries the OUTER depth and its matching
    * `)` carries that same depth again — so "top level" is uniformly
    * `depth(i) == 0 && !quoted(i)` for separators, keywords, and the
    * close paren matching a statement-initial open.
    */
  private def scanMask(s: String): (Array[Boolean], Array[Int]) = {
    val n = s.length
    val quoted = new Array[Boolean](n)
    val depth = new Array[Int](n)
    var i = 0; var d = 0; var quote: Char = 0
    def markNext(): Unit = if (i + 1 < n) {
      quoted(i + 1) = true; depth(i + 1) = d; i += 1
    }
    while (i < n) {
      val c = s.charAt(i)
      depth(i) = d
      if (quote != 0) {
        quoted(i) = true
        if (quote != '`' && c == '\\') markNext() // escape: skip next
        else if (c == quote) {
          if (quote != '`' && i + 1 < n && s.charAt(i + 1) == quote) markNext()
          else quote = 0
        }
      } else c match {
        case '\'' | '"' | '`' => quote = c; quoted(i) = true
        case '(' => d += 1
        case ')' => d -= 1; depth(i) = d
        case _ => ()
      }
      i += 1
    }
    (quoted, depth)
  }

  private def isWordChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'

  /** Index of the first occurrence of standalone `word` at paren depth 0
    * outside quotes, case-insensitive; None if absent.
    */
  private[sources] def topLevelKeyword(s: String, word: String): Option[Int] = {
    val (quoted, depth) = scanMask(s)
    val w = word.length
    (0 to s.length - w).find { i =>
      !quoted(i) && depth(i) == 0 &&
        s.regionMatches(true, i, word, 0, w) &&
        (i == 0 || !isWordChar(s.charAt(i - 1))) &&
        (i + w == s.length || !isWordChar(s.charAt(i + w)))
    }
  }

  /** Index of the `)` matching the `(` at position 0 (quote-aware);
    * throws if unbalanced.
    */
  private[sources] def matchingParen(s: String): Int = {
    require(s.nonEmpty && s.charAt(0) == '(', s"expected '(': $s")
    val (quoted, depth) = scanMask(s)
    var i = 1
    while (i < s.length) {
      if (s.charAt(i) == ')' && !quoted(i) && depth(i) == 0) return i
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced parens in: $s")
  }

  /** Split on `sep` at paren depth 0 outside quotes. */
  private[sources] def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val (quoted, depth) = scanMask(s)
    val out = Seq.newBuilder[String]
    var start = 0; var i = 0
    while (i < s.length) {
      if (s.charAt(i) == sep && !quoted(i) && depth(i) == 0) {
        out += s.substring(start, i); start = i + 1
      }
      i += 1
    }
    out += s.substring(start)
    out.result()
  }

  /** Split on standalone keyword `word` at depth 0 (for ON ... AND ...). */
  private[sources] def splitTopLevelWord(s: String, word: String): Seq[String] = {
    topLevelKeyword(s, word) match {
      case Some(i) =>
        s.substring(0, i) +: splitTopLevelWord(s.substring(i + word.length), word)
      case None => Seq(s)
    }
  }
}
