package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal

/** Extended operator coverage (SURVEY.md §2.4 A8-A9, §2.5 W2, §2.7,
  * §2.10 D4): set ops, cube/grouping sets, statistical aggregates,
  * percentiles, per-group top-k, calendar rollups, multimodal columns.
  */
object ExtendedQueries {
  import CoreQueries.QFn

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  // q30 — multimodal feature extraction (D4): binary content + metadata
  // struct + stub-decoded dims (see operators.Multimodal for the stub
  // contract). Portable because the stub is byte-length arithmetic.
  private def q30(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val mm = Multimodal.withContent(t(s, dir, "documents"), "text", "doc_id")
    // BIGINT casts: Spark octet_length/pmod yield int32 where DuckDB's
    // octet_length yields BIGINT — dtype parity for the hash compare
    mm.select($"doc_id", $"mime",
        $"meta.n_bytes".cast("long").as("n_bytes"),
        Multimodal.stubWidth($"content").cast("long").as("width"),
        Multimodal.stubHeight($"content").cast("long").as("height"),
        Multimodal.stubDurationMs($"content").as("duration_ms"))
      .orderBy($"doc_id")
  }

  private val q30Sql =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image/png'
      |       WHEN doc_id % 3 = 1 THEN 'audio/wav'
      |       ELSE 'video/mp4' END AS mime,
      |  octet_length(encode(text)) AS n_bytes,
      |  octet_length(encode(text)) % 640 + 1 AS width,
      |  octet_length(encode(text)) % 480 + 1 AS height,
      |  CAST(octet_length(encode(text)) AS BIGINT) * 10 + 1000 AS duration_ms
      |FROM documents ORDER BY doc_id""".stripMargin

  // q53 — batch decode via mapPartitions (D4, the mapInPandas batch
  // shape): typed iterator in / typed iterator out, codec handle
  // amortized once per partition. The stub's outputs are byte-length
  // arithmetic, so unlike most binary pipelines this one IS
  // oracle-checkable (width/height stay int32 on both engines; the
  // content checksum is engine-specific and excluded).
  private def q53(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Multimodal
      .withContent(t(s, dir, "documents"), "text", "doc_id")
      .select($"doc_id", $"mime", $"content")
      .as[graft.operators.MediaRow]
    Multimodal.decodePartitions(media).toDF()
      .select($"doc_id", $"mime", $"width", $"height", $"duration_ms")
      .orderBy($"doc_id")
  }

  private val q53Sql =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image/png'
      |       WHEN doc_id % 3 = 1 THEN 'audio/wav'
      |       ELSE 'video/mp4' END AS mime,
      |  CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
      |  CAST(octet_length(encode(text)) % 480 + 1 AS INTEGER) AS height,
      |  CAST(octet_length(encode(text)) AS BIGINT) * 10 + 1000 AS duration_ms
      |FROM documents ORDER BY doc_id""".stripMargin

  // q31 — frame sampling (D4): bounded explode per video row.
  private def q31(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val mm = Multimodal.withContent(t(s, dir, "documents"), "text", "doc_id")
    Multimodal.sampleFrames(mm, everyMs = 1000L, maxFrames = 5)
      .select($"doc_id", $"frame_idx", $"frame_offset_ms")
      .orderBy($"doc_id", $"frame_idx")
  }

  private val q31Sql =
    """WITH v AS (
      |  SELECT doc_id,
      |    CAST(octet_length(encode(text)) AS BIGINT) * 10 + 1000 AS duration_ms
      |  FROM documents WHERE doc_id % 3 = 2)
      |SELECT doc_id, CAST(i AS INT) AS frame_idx, i * 1000 AS frame_offset_ms
      |FROM v, unnest(range(least(duration_ms // 1000 + 1, 5))) t(i)
      |ORDER BY doc_id, frame_idx""".stripMargin

  // q32 — UNION ALL (§2.7: the multi-partition concat the reference does
  // imperatively at lakehouse.py:356-361).
  private def q32(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "events")
    val purchases = e.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", lit("p").as("src"))
    val errors = e.filter($"event_type" === "error")
      .select($"event_id", $"user_id", lit("e").as("src"))
    purchases.unionAll(errors)
      .groupBy($"src").agg(count(lit(1)).as("cnt"),
        countDistinct($"user_id").as("users"))
      .orderBy($"src")
  }

  private val q32Sql =
    """SELECT src, count(*) AS cnt, count(DISTINCT user_id) AS users FROM (
      |  SELECT event_id, user_id, 'p' AS src FROM events WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT event_id, user_id, 'e' AS src FROM events WHERE event_type = 'error')
      |GROUP BY src ORDER BY src""".stripMargin

  // q33 — CUBE over two dims (A9).
  private def q33(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .cube($"c_mktsegment", $"c_nationkey")
      .agg(count(lit(1)).as("cnt"))
      .select(coalesce($"c_mktsegment", lit("(all)")).as("segment"),
        coalesce($"c_nationkey", lit(-1)).as("nationkey"), $"cnt")
      .orderBy($"segment", $"nationkey")
  }

  private val q33Sql =
    """SELECT COALESCE(c_mktsegment, '(all)') AS segment,
      |  COALESCE(c_nationkey, -1) AS nationkey, count(*) AS cnt
      |FROM customer GROUP BY CUBE(c_mktsegment, c_nationkey)
      |ORDER BY segment, nationkey""".stripMargin

  // q34 — GROUPING SETS (A9): chosen granularities only.
  private def q34(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT COALESCE(o_orderstatus, '(all)') AS status,
        |  COALESCE(o_orderpriority, '(all)') AS priority, count(*) AS cnt
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY status, priority""".stripMargin)
  }

  private val q34Sql =
    """SELECT COALESCE(o_orderstatus, '(all)') AS status,
      |  COALESCE(o_orderpriority, '(all)') AS priority, count(*) AS cnt
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
      |ORDER BY status, priority""".stripMargin

  // q35 — statistical aggregates (A5 extension): stddev / corr / covar.
  // Sample stddev over ~12k rows/group: cross-engine double noise is
  // ~1e-11 relative, far inside ROUND(.,4).
  private def q35(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        round(stddev($"l_quantity"), 4).as("sd_qty"),
        round(corr($"l_quantity", $"l_extendedprice"), 4).as("corr_qty_price"),
        round(covar_samp($"l_quantity", $"l_discount"), 4).as("cov_qty_disc"))
      .orderBy($"l_returnflag")
  }

  private val q35Sql =
    """SELECT l_returnflag,
      |  round(stddev_samp(l_quantity), 4) AS sd_qty,
      |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
      |  round(covar_samp(l_quantity, l_discount), 4) AS cov_qty_disc
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // q36 — exact percentiles (median / p90) via interpolated quantile.
  private def q36(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT o_orderpriority,
        |  round(percentile(o_totalprice, 0.5), 4) AS p50,
        |  round(percentile(o_totalprice, 0.9), 4) AS p90
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  private val q36Sql =
    """SELECT o_orderpriority,
      |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // q49 — approx percentiles: the 100 TB twin of q36. Exact `percentile`
  // buffers and sorts every group value; `approx_percentile` (t-digest
  // style sketch, mergeable map-side) is the only shape that survives
  // billions of rows per group. Sketch results are engine-specific →
  // rows-only check; q36 stays the exact oracle pin.
  private def q49(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT o_orderpriority,
        |  round(approx_percentile(o_totalprice, 0.5, 10000), 4) AS p50,
        |  round(approx_percentile(o_totalprice, 0.9, 10000), 4) AS p90
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  // q37 — per-group top-k (W2): top-3 orders by value within each
  // priority, via ranked window (the scalable top-k-per-key shape:
  // partial top-k per partition before the shuffle under AQE).
  private def q37(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    t(s, dir, "orders")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 3)
      .select($"o_orderpriority", $"rk", $"o_orderkey",
        round($"o_totalprice", 2).as("o_totalprice"))
      .orderBy($"o_orderpriority", $"rk")
  }

  private val q37Sql =
    """SELECT o_orderpriority, rk, o_orderkey, round(o_totalprice, 2) AS o_totalprice
      |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
      |        row_number() OVER (PARTITION BY o_orderpriority
      |          ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |      FROM orders)
      |WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin

  // q38 — calendar rollup (F1/F2 date functions): monthly revenue.
  private def q38(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy(date_format($"l_shipdate", "yyyy-MM").as("month"))
      .agg(
        round(sum($"l_extendedprice".cast("decimal(18,2)")), 2).cast("double")
          .as("revenue"),
        count(lit(1)).as("items"))
      .orderBy($"month")
  }

  private val q38Sql =
    """SELECT strftime(l_shipdate, '%Y-%m') AS month,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue,
      |  count(*) AS items
      |FROM lineitem GROUP BY 1 ORDER BY month""".stripMargin

  // q39 — approximate distinct (A8 HLL++): rows-only (sketch
  // implementations differ across engines by design; the exact
  // counterpart is oracle-checked in q10).
  private def q39(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey", 0.05).as("approx_parts"),
        countDistinct($"l_partkey").as("exact_parts"))
      .orderBy($"l_returnflag")
  }

  // q40 — range/interval join (J6): views in the hour before each
  // purchase, same user. Planner shape: hash join on the user equi-key
  // with the range as a post-join filter — the bucketed equi+theta
  // formulation SURVEY §2.3 prescribes (the time bucket here is the user;
  // at 100 TB add a coarse time-bucket key to both sides).
  private def q40(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "events")
    val p = e.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id".as("p_user"), $"ts_us".as("p_ts"))
    val v = e.filter($"event_type" === "view")
      .select($"user_id".as("v_user"), $"ts_us".as("v_ts"))
    p.join(v, $"p_user" === $"v_user" &&
        $"v_ts" >= $"p_ts" - 3600000000L && $"v_ts" < $"p_ts", "left")
      .groupBy($"p_id")
      .agg(count($"v_ts").as("views_1h"))
      .orderBy($"p_id")
  }

  private val q40Sql =
    """WITH p AS (SELECT event_id p_id, user_id p_user, epoch_us(ts) p_ts
      |           FROM events WHERE event_type = 'purchase'),
      |v AS (SELECT user_id v_user, epoch_us(ts) v_ts FROM events WHERE event_type = 'view')
      |SELECT p_id, count(v_ts) AS views_1h
      |FROM p LEFT JOIN v ON p_user = v_user
      |  AND v_ts >= p_ts - 3600000000 AND v_ts < p_ts
      |GROUP BY p_id ORDER BY p_id""".stripMargin

  // q44 — PIVOT (wide-format aggregation): per-user event-type counts.
  // Spark's pivot == conditional aggregation; the oracle states it that
  // way (portable), with explicit 0 for absent combinations.
  private def q44(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val types = Seq("click", "error", "purchase", "signup", "view")
    val p = t(s, dir, "events")
      .filter($"user_id" < 30)
      .groupBy($"user_id")
      .pivot("event_type", types)
      .agg(count(lit(1)))
    p.select($"user_id" +: types.map(c => coalesce(col(c), lit(0L)).as(c)): _*)
      .orderBy($"user_id")
  }

  private val q44Sql =
    """SELECT user_id,
      |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
      |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
      |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
      |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
      |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view
      |FROM events WHERE user_id < 30
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  // q45 — ranking-function family (W-series completeness): rank/dense_rank
  // /percent_rank/cume_dist over a ties-bearing value ordering, plus
  // row_number/ntile/lead/first_value over the event-time ordering.
  private def q45(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byValue = Window.partitionBy($"user_id").orderBy($"value")
    val bySeq = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    t(s, dir, "events")
      .filter($"user_id" < 10)
      .select($"user_id", $"event_id",
        rank().over(byValue).cast("long").as("rnk"),
        dense_rank().over(byValue).cast("long").as("drnk"),
        round(percent_rank().over(byValue), 4).as("pr"),
        round(cume_dist().over(byValue), 4).as("cd"),
        row_number().over(bySeq).cast("long").as("rn"),
        ntile(4).over(bySeq).cast("long").as("quartile"),
        round(coalesce(lead($"value", 1).over(bySeq), lit(-1.0)), 4).as("next_value"),
        round(first($"value").over(bySeq), 4).as("first_value"))
      .orderBy($"user_id", $"event_id")
  }

  private val q45Sql =
    """SELECT user_id, event_id,
      |  rank() OVER wv AS rnk,
      |  dense_rank() OVER wv AS drnk,
      |  round(percent_rank() OVER wv, 4) AS pr,
      |  round(cume_dist() OVER wv, 4) AS cd,
      |  row_number() OVER ws AS rn,
      |  ntile(4) OVER ws AS quartile,
      |  round(COALESCE(lead(value, 1) OVER ws, -1.0), 4) AS next_value,
      |  round(first_value(value) OVER ws, 4) AS first_value
      |FROM events WHERE user_id < 10
      |WINDOW wv AS (PARTITION BY user_id ORDER BY value),
      |       ws AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      |ORDER BY user_id, event_id""".stripMargin

  // q46 — fuzzy matching: edit distance over the near-dup pairs found by
  // q24 (Levenshtein's unit-cost distance is engine-portable) — the
  // second-stage verifier of a text-dedup pipeline.
  private def q46(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
      .select($"doc_id", substring($"text", 1, 80).as("head"))
    DedupQueries.neardupPairs(s, dir)
      .join(docs.select($"doc_id".as("a_id"), $"head".as("a_head")), "a_id")
      .join(docs.select($"doc_id".as("b_id"), $"head".as("b_head")), "b_id")
      .select($"a_id", $"b_id", $"jaccard",
        levenshtein($"a_head", $"b_head").cast("long").as("edit_dist"))
      .orderBy($"a_id", $"b_id")
  }

  private val q46Sql =
    """WITH w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\W+'), x -> x <> '') ws
      |  FROM documents),
      |sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
      |  FROM w, unnest(range(1, len(ws) - 1)) t(i)),
      |sz AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
      |pairs AS (SELECT a.doc_id a_id, b.doc_id b_id, count(*) inter
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
      |jac AS (SELECT a_id, b_id,
      |    round(inter * 1.0 / (sa.n + sb.n - inter), 4) AS jaccard
      |  FROM pairs JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id
      |  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5)
      |SELECT a_id, b_id, jaccard,
      |  levenshtein(substring(da.text, 1, 80), substring(db.text, 1, 80)) AS edit_dist
      |FROM jac JOIN documents da ON da.doc_id = a_id
      |         JOIN documents db ON db.doc_id = b_id
      |ORDER BY a_id, b_id""".stripMargin

  // q47 — correlated scalar subquery (SURVEY §4 "subquery decorrelation:
  // free in Catalyst"): orders priced above their priority class's mean.
  // Catalyst rewrites the correlation into an aggregate + join.
  private def q47(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT o_orderpriority, count(*) AS above_avg
        |FROM orders o
        |WHERE o_totalprice > (SELECT avg(i.o_totalprice) FROM orders i
        |                      WHERE i.o_orderpriority = o.o_orderpriority)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  private val q47Sql =
    """SELECT o_orderpriority, count(*) AS above_avg
      |FROM orders o
      |WHERE o_totalprice > (SELECT avg(i.o_totalprice) FROM orders i
      |                      WHERE i.o_orderpriority = o.o_orderpriority)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // q48 — recursive CTE (Spark 4.x WITH RECURSIVE): dense month spine over
  // the order-date range, left-joined to monthly order counts — the
  // calendar-spine pattern that reports zero for gap months. Orders
  // pre-aggregate to per-month counts BELOW the join (VERDICT r5 #8):
  // the spine join then shuffles ~80 aggregate rows instead of the full
  // 150k-row fact relation keyed by a derived string — at 100 TB the
  // difference is the whole fact table through an Exchange vs a
  // broadcastable month summary.
  private def q48(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """WITH RECURSIVE months(m) AS (
        |  SELECT DATE '1995-01-01'
        |  UNION ALL SELECT m + INTERVAL 1 MONTH FROM months
        |  WHERE m < DATE '2001-08-01'),
        |mo AS (SELECT date_format(o_orderdate, 'yyyy-MM') AS om,
        |         count(*) AS n
        |       FROM orders GROUP BY 1)
        |SELECT date_format(m, 'yyyy-MM') AS month,
        |  CAST(coalesce(n, 0) AS BIGINT) AS n_orders
        |FROM months LEFT JOIN mo ON om = date_format(m, 'yyyy-MM')
        |ORDER BY month""".stripMargin)
  }

  private val q48Sql =
    """WITH RECURSIVE months(m) AS (
      |  SELECT DATE '1995-01-01'
      |  UNION ALL SELECT m + INTERVAL 1 MONTH FROM months
      |  WHERE m < DATE '2001-08-01'),
      |mo AS (SELECT strftime(o_orderdate, '%Y-%m') AS om, count(*) AS n
      |       FROM orders GROUP BY 1)
      |SELECT strftime(m, '%Y-%m') AS month,
      |  CAST(coalesce(n, 0) AS BIGINT) AS n_orders
      |FROM months LEFT JOIN mo ON om = strftime(m, '%Y-%m')
      |ORDER BY month""".stripMargin

  // q52 — part-dimension join (TPC-H Q14 shape): revenue by part type.
  // `part` broadcasts (dimension), so the fact table never shuffles for
  // the join — the only exchange is the small final groupBy. Completes
  // testdata table coverage (part was the one unqueried table).
  private def q52(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")), $"l_partkey" === $"p_partkey")
      .groupBy($"p_type")
      .agg(
        round(sum($"l_extendedprice".cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)"))), 2)
          .cast("double").as("revenue"),
        count(lit(1)).as("line_count"),
        round(avg($"p_retailprice"), 4).as("avg_retail"))
      .orderBy($"p_type")
  }

  private val q52Sql =
    """SELECT p_type,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
      |  count(*) AS line_count,
      |  round(avg(p_retailprice), 4) AS avg_retail
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_type ORDER BY p_type""".stripMargin

  // q67 — sessionization (gaps-and-islands): split each user's event
  // stream into sessions at >30-minute silences, then aggregate per
  // session. The batch twin of the streaming tier's session_window (T7)
  // — and the shape every behavioral/telemetry pipeline needs. Scale
  // shape: ONE shuffle on user_id serves both windows AND the final
  // aggregate (same partitioning, Exchange reuse); the session id is a
  // running sum over the already-sorted partition, so no second sort.
  // (session_window exists in batch Spark too, but its [start,end)
  // interval semantics differ from the gap rule and aren't portable to
  // an oracle; the windowed form is exact and engine-neutral.)
  private def q67(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    // spread: the single-row-group events scan otherwise feeds the
    // session window from one task (Tables.loadSpread scaladoc)
    Tables.loadSpread(s, dir, "events")
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .withColumn("new_s",
        when($"prev_ts".isNull ||
          unix_micros($"ts") - unix_micros($"prev_ts") > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("session_no", sum($"new_s").over(w))
      .groupBy($"user_id", $"session_no")
      // epoch-µs longs, not raw timestamps: the parquet↔pandas↔DuckDB
      // dtype bridge is exact for int64 (catalog convention, cf. q13/q17)
      .agg(min(unix_micros($"ts")).as("session_start"),
        max(unix_micros($"ts")).as("session_end"),
        count(lit(1)).as("n_events"), round(sum($"value"), 4).as("sum_value"))
      .orderBy($"user_id", $"session_start")
  }

  private val q67Sql =
    """WITH g AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts, value,
      |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_no
      |  FROM g)
      |SELECT user_id, session_no, min(epoch_us(ts)) AS session_start,
      |  max(epoch_us(ts)) AS session_end,
      |  count(*) AS n_events, round(sum(value), 4) AS sum_value
      |FROM s GROUP BY user_id, session_no ORDER BY user_id, session_start""".stripMargin

  // q71 — trailing TIME-interval window (W4's value-frame twin): per
  // user, aggregate everything in the last 10 minutes BY TIMESTAMP, not
  // by row count — the frame a rate limiter / rolling-exposure monitor
  // actually means. rangeBetween on epoch-µs: value-based bounds, so
  // ties are peers (identical frame for equal ts) and the result is
  // deterministic without a tie-break INSIDE the frame; row order is
  // still totally keyed for the oracle compare. Same scale shape as
  // q14: one user_id shuffle, one sort, codegen'd running frame.
  private def q71(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
      .rangeBetween(-600000000L, 0L)
    t(s, dir, "events")
      .filter($"user_id" < 20)
      .withColumn("n_10m", count(lit(1)).over(w))
      .withColumn("sum_10m", round(sum($"value").over(w), 4))
      .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"),
        $"n_10m", $"sum_10m")
      .orderBy($"user_id", $"ts_us", $"event_id")
  }

  private val q71Sql =
    """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |  count(*) OVER w AS n_10m,
      |  round(sum(value) OVER w, 4) AS sum_10m
      |FROM events WHERE user_id < 20
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |  RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, ts_us, event_id""".stripMargin

  // q73 — ordered funnel analysis (view → click → purchase): for each
  // user, the first 'view', the first 'click' strictly AFTER that view,
  // and the first 'purchase' strictly after that click; report how many
  // users survive each stage. The event-sequence operator every product
  // analytics suite ships (and the reason events carry (user_id, ts,
  // event_type)). Scale shape: ONE shuffle on user_id, then three
  // stacked unbounded-frame Window mins over the SAME partitioning
  // (Exchange reused, no sort needed for whole-partition frames), a
  // per-user dedup on that partitioning, and a 1-row global aggregate
  // unpivoted with stack() — the events relation never shuffles twice.
  // Conditional-min chaining (tb uses ta, tc uses tb) is the standard
  // trick for "first B after A" without a self-join per stage.
  private def q73(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id")
    t(s, dir, "events")
      .withColumn("ta", min(when($"event_type" === "view", $"ts")).over(w))
      .withColumn("tb", min(when($"event_type" === "click" && $"ts" > $"ta", $"ts")).over(w))
      .withColumn("tc", min(when($"event_type" === "purchase" && $"ts" > $"tb", $"ts")).over(w))
      .groupBy($"user_id")
      .agg(max($"ta").as("ta"), max($"tb").as("tb"), max($"tc").as("tc"))
      .agg(count($"ta").as("s1"), count($"tb").as("s2"), count($"tc").as("s3"))
      .select(expr(
        "stack(3, 1, 'view', s1, 2, 'click', s2, 3, 'purchase', s3) AS (step, stage, users)"))
      .orderBy($"step")
  }

  private val q73Sql =
    """WITH a AS (
      |  SELECT user_id, min(ts) AS ta FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |b AS (
      |  SELECT e.user_id, min(e.ts) AS tb FROM events e
      |  JOIN a ON e.user_id = a.user_id
      |  WHERE e.event_type = 'click' AND e.ts > a.ta GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, min(e.ts) AS tc FROM events e
      |  JOIN b ON e.user_id = b.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > b.tb GROUP BY 1)
      |SELECT CAST(1 AS INTEGER) AS step, 'view' AS stage, (SELECT count(*) FROM a) AS users
      |UNION ALL SELECT CAST(2 AS INTEGER), 'click', (SELECT count(*) FROM b)
      |UNION ALL SELECT CAST(3 AS INTEGER), 'purchase', (SELECT count(*) FROM c)
      |ORDER BY step""".stripMargin

  // q74 — weekly cohort retention: users cohorted by the week of their
  // FIRST event; for each (cohort_week, week_offset) cell, how many of
  // that cohort were active that many weeks later — the retention
  // triangle behind every growth dashboard. All bucketing is integer
  // division on epoch-µs (`div` truncates, `//` floors; identical on
  // the non-negative epochs here), so the cells are bit-exact across
  // engines with no calendar/timezone semantics in play. Scale shape:
  // one shuffle on user_id for the first-event window, then a
  // (cohort, offset)-keyed count-distinct — at 100 TB the distinct is
  // the expensive part; swap in approx_count_distinct per cell if ±2%
  // is acceptable (q39's documented trade).
  private def q74(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id")
    t(s, dir, "events")
      .select($"user_id",
        expr("unix_micros(ts) div 86400000000").as("day"))
      .withColumn("fday", min($"day").over(w))
      .select($"user_id", expr("fday div 7").as("cohort_week"),
        expr("(day - fday) div 7").as("week_offset"))
      .groupBy($"cohort_week", $"week_offset")
      .agg(countDistinct($"user_id").as("active_users"))
      .orderBy($"cohort_week", $"week_offset")
  }

  private val q74Sql =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
      |    min(epoch_us(ts) // 86400000000) OVER (PARTITION BY user_id) AS fday
      |  FROM events)
      |SELECT fday // 7 AS cohort_week, (day - fday) // 7 AS week_offset,
      |  count(DISTINCT user_id) AS active_users
      |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // q77 — equi-width histogram profiling (the data-profiling primitive
  // behind ANALYZE/drift monitoring): bucket l_extendedprice into 20
  // equal-width bins over its observed [min, max], count + mass share
  // per bin. Bin edges come from a 1-row global aggregate that
  // BROADCASTS back (two passes over the column, both scan-speed,
  // map-side-combined — the classic two-pass histogram; at 100 TB both
  // passes are embarrassingly parallel and the histogram itself is 20
  // rows). Bin index is floor((x-min)/w) on doubles clamped to [0,19];
  // identical IEEE arithmetic both engines.
  private def q77(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bounds = t(s, dir, "lineitem")
      .agg(min($"l_extendedprice").as("lo"), max($"l_extendedprice").as("hi"))
    t(s, dir, "lineitem")
      .crossJoin(broadcast(bounds))
      .select(least(floor(($"l_extendedprice" - $"lo") /
        (($"hi" - $"lo") / lit(20.0))), lit(19L)).cast("long").as("bin"),
        $"l_extendedprice", $"lo", $"hi")
      .groupBy($"bin")
      .agg(count(lit(1)).as("cnt"),
        round(min($"l_extendedprice"), 2).as("bin_min"),
        round(max($"l_extendedprice"), 2).as("bin_max"))
      .orderBy($"bin")
  }

  private val q77Sql =
    """WITH b AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi FROM lineitem)
      |SELECT CAST(least(floor((l_extendedprice - lo) / ((hi - lo) / 20.0)), 19) AS BIGINT) AS bin,
      |  count(*) AS cnt,
      |  round(min(l_extendedprice), 2) AS bin_min,
      |  round(max(l_extendedprice), 2) AS bin_max
      |FROM lineitem, b GROUP BY 1 ORDER BY 1""".stripMargin

  // q79 — realized volatility (the quant risk metric: per-entity daily
  // sum of squared log returns, Andersen/Bollerslev realized-variance
  // estimator). Returns are WITHIN-day (the overnight gap is not a
  // return); each squared log return is rounded to 8 dp and summed as
  // DECIMAL so the per-day sum is order-independent across engines
  // (q72's trick — float sums are not associative). A non-positive
  // price has no log return, so pairs touching a zero value are
  // dropped AFTER the lag (the zero row still separates its
  // neighbours) — this is both the correct semantics and the guard
  // that keeps ANSI mode from raising DIVIDE_BY_ZERO on zero-valued
  // rows (present at sf0.1 but not sf0.01). Scale shape: ONE
  // (user, day)-keyed shuffle serves the lag window and the aggregate
  // (same partitioning), exactly q67's Exchange-reuse contract.
  private def q79(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = t(s, dir, "events")
      .select($"user_id", $"ts", $"event_id", $"value",
        expr("unix_micros(ts) div 86400000000").as("day"))
    val w = Window.partitionBy($"user_id", $"day").orderBy($"ts", $"event_id")
    base
      .withColumn("prev", lag($"value", 1).over(w))
      .filter($"prev".isNotNull && $"value" > 0 && $"prev" > 0)
      .select($"user_id", $"day",
        round(pow(log($"value" / $"prev"), 2), 8)
          .cast("decimal(18,8)").as("r2"))
      .groupBy($"user_id", $"day")
      .agg(count(lit(1)).as("n_returns"),
        round(sum($"r2").cast("double"), 4).as("realized_var"))
      .orderBy($"user_id", $"day")
  }

  private val q79Sql =
    """WITH r AS (
      |  SELECT user_id, epoch_us(ts) // 86400000000 AS day, value,
      |    lag(value) OVER (PARTITION BY user_id, epoch_us(ts) // 86400000000
      |      ORDER BY ts, event_id) AS prev
      |  FROM events)
      |SELECT user_id, day, count(*) AS n_returns,
      |  round(CAST(sum(CAST(round(pow(ln(value / prev), 2), 8) AS DECIMAL(18,8))) AS DOUBLE), 4) AS realized_var
      |FROM r WHERE prev IS NOT NULL AND value > 0 AND prev > 0
      |GROUP BY user_id, day ORDER BY user_id, day""".stripMargin

  // q80 — maximum drawdown (peak-to-trough loss over a running maximum):
  // the other canonical risk metric. The running peak is a cumulative
  // window max — codegen'd, one shuffle on the entity key; drawdown is a
  // pure row-local expression on (peak, value), so the result is
  // bit-deterministic across engines with no summation at all. Output
  // rounded to 6 dp with a total key order. A zero peak (the entity's
  // prices so far are all zero) has no defined drawdown — guard it to
  // 0.0 in both engines; without the guard ANSI mode raises
  // DIVIDE_BY_ZERO whenever an entity's FIRST price is 0 (value = 0
  // rows exist at sf0.1; data-dependent, same class of bug as q79).
  private def q80(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .withColumn("peak", max($"value").over(w))
      .select($"user_id",
        when($"peak" > 0, ($"peak" - $"value") / $"peak")
          .otherwise(lit(0.0)).as("dd"))
      .groupBy($"user_id")
      .agg(round(max($"dd"), 6).as("max_drawdown"))
      .orderBy($"user_id")
  }

  private val q80Sql =
    """WITH p AS (
      |  SELECT user_id, value,
      |    max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      |  FROM events)
      |SELECT user_id, round(max(CASE WHEN peak > 0 THEN (peak - value) / peak ELSE 0.0 END), 6) AS max_drawdown
      |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin

  // q81 — regression aggregates (regr_slope / regr_intercept / regr_r2
  // per group, the OLAP least-squares family) computed INTEGER-EXACT:
  // x = whole seconds since the corpus start (int), y = value in cents
  // (int), and every moment (n, Σx, Σy, Σxy, Σx², Σy²) is an exact
  // integer sum carried as DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) —
  // the normal-equation numerators and denominators are therefore
  // bit-identical integers in both engines, and the ONLY float ops are
  // the final divisions. The naive float formulation differs across
  // engines in summation order; built-in regr_* functions differ in
  // accumulation scheme — this shape is the portable one. Scale: a
  // plain 6-moment map-side-combined aggregate, one shuffle on the
  // group key, broadcast 1-row origin.
  private def q81(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val origin = t(s, dir, "events")
      .agg(min(unix_micros($"ts")).as("t0"))
    val moments = t(s, dir, "events")
      .crossJoin(broadcast(origin))
      .select($"event_type",
        expr("(unix_micros(ts) - t0) div 1000000").cast("decimal(38,0)").as("x"),
        round($"value" * 100, 0).cast("decimal(38,0)").as("y"))
      .groupBy($"event_type")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"),
        sum($"x" * $"x").as("sxx"),
        sum($"y" * $"y").as("syy"))
    moments.select($"event_type", $"n".cast("long").as("n"),
      round(($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
        ($"n" * $"sxx" - $"sx" * $"sx").cast("double"), 8).as("slope_cents_per_s"),
      round(($"sy".cast("double") -
        (($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
          ($"n" * $"sxx" - $"sx" * $"sx").cast("double")) * $"sx".cast("double")) /
        $"n".cast("double"), 4).as("intercept_cents"),
      round((($"n" * $"sxy" - $"sx" * $"sy").cast("double") *
        ($"n" * $"sxy" - $"sx" * $"sy").cast("double")) /
        (($"n" * $"sxx" - $"sx" * $"sx").cast("double") *
          ($"n" * $"syy" - $"sy" * $"sy").cast("double")), 6).as("r2"))
      .orderBy($"event_type")
  }

  private val q81Sql =
    """WITH o AS (SELECT min(epoch_us(ts)) AS t0 FROM events),
      |m AS (
      |  SELECT event_type,
      |    count(*) AS n,
      |    sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
      |    sum(x*x) AS sxx, sum(y*y) AS syy
      |  FROM (SELECT event_type,
      |          (epoch_us(ts) - t0) // 1000000 AS x,
      |          CAST(round(value * 100, 0) AS BIGINT) AS y
      |        FROM events, o)
      |  GROUP BY event_type)
      |SELECT event_type, CAST(n AS BIGINT) AS n,
      |  round(CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE), 8) AS slope_cents_per_s,
      |  round((CAST(sy AS DOUBLE) - (CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 4) AS intercept_cents,
      |  round((CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE)) / (CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)), 6) AS r2
      |FROM m ORDER BY event_type""".stripMargin

  // q85 — PII redaction (privacy scrubbing: the compliance pass every
  // LLM training pipeline runs before tokenization). The synthetic
  // corpus carries no real PII, so the query synthesizes a deterministic
  // audit-log line per event — email, IPv4, card number, all pure
  // functions of the row — and redacts it with the regex classes a real
  // scrubber uses. Patterns stay inside the Java-regex/RE2 common subset
  // (no lookarounds, no backreferences) for engine parity. Scale shape:
  // a narrow per-row codegen'd map (format_string + regexp_replace
  // chain) with NO shuffle — at 100 TB this is scan → map → write with
  // full column pruning; the only wide op is the final presentation sort.
  private val piiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val piiIp = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val piiCard = "\\b\\d{4}-\\d{4}-\\d{4}-\\d{4}\\b"

  private def q85(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = format_string(
      "user %d <u%d@ex%d.example.com> from 10.%d.%d.%d did %s",
      $"user_id", $"user_id", pmod($"user_id", lit(7L)),
      pmod($"event_id", lit(256L)), pmod($"user_id", lit(256L)),
      pmod($"event_id" * 7, lit(256L)), $"event_type")
    val card = when(pmod($"event_id", lit(3L)) === 0,
      format_string(" card 4111-2222-3333-%04d", pmod($"event_id", lit(10000L))))
      .otherwise(lit(""))
    val cc = when(pmod($"user_id", lit(5L)) === 0,
      format_string(" cc admin%d@corp.example.org", pmod($"user_id", lit(100L))))
      .otherwise(lit(""))
    // spread: the regex-redaction kernel is per-row compute rooted at a
    // single-row-group scan (Tables.loadSpread scaladoc)
    Tables.loadSpread(s, dir, "events")
      .where($"event_type" === "error")
      .select($"event_id", concat(base, card, cc).as("line"))
      .select($"event_id",
        regexp_replace(regexp_replace(regexp_replace($"line",
          piiEmail, "[EMAIL]"), piiIp, "[IP]"), piiCard, "[CARD]")
          .as("redacted"),
        (regexp_count($"line", lit(piiEmail)) +
          regexp_count($"line", lit(piiIp)) +
          regexp_count($"line", lit(piiCard))).cast("long").as("n_pii"))
      .orderBy($"event_id")
  }

  private val q85Sql =
    """WITH lines AS (
      |  SELECT event_id,
      |    printf('user %d <u%d@ex%d.example.com> from 10.%d.%d.%d did %s',
      |      user_id, user_id, user_id % 7, event_id % 256, user_id % 256,
      |      (event_id * 7) % 256, event_type)
      |    || CASE WHEN event_id % 3 = 0
      |            THEN printf(' card 4111-2222-3333-%04d', event_id % 10000)
      |            ELSE '' END
      |    || CASE WHEN user_id % 5 = 0
      |            THEN printf(' cc admin%d@corp.example.org', user_id % 100)
      |            ELSE '' END AS line
      |  FROM events WHERE event_type = 'error')
      |SELECT event_id,
      |  regexp_replace(regexp_replace(regexp_replace(line,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
      |    '\b\d{4}-\d{4}-\d{4}-\d{4}\b', '[CARD]', 'g') AS redacted,
      |  CAST(len(regexp_extract_all(line, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
      |     + len(regexp_extract_all(line, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
      |     + len(regexp_extract_all(line, '\b\d{4}-\d{4}-\d{4}-\d{4}\b'))
      |    AS BIGINT) AS n_pii
      |FROM lines ORDER BY event_id""".stripMargin

  // q87 — robust outlier detection via median/MAD (the quality gate that
  // survives heavy-tailed data where mean/stddev z-scores drown): flag
  // events whose |value − median| exceeds 3 scaled MADs of their
  // event_type. Two grouped exact medians (one for the center, one for
  // the deviations) + two BROADCAST joins of the 5-row stats relation —
  // the fact table shuffles only for the grouped percentiles. The
  // medians are exact (the oracle pin); at 100 TB swap them for
  // approx_percentile / a t-digest sketch with the same downstream
  // algebra. 1.4826 is the normal-consistency constant (MAD → σ).
  private def q87(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
    val med = ev.groupBy($"event_type").agg(median($"value").as("med"))
    val mad = ev.join(broadcast(med), "event_type")
      .groupBy($"event_type")
      .agg(median(abs($"value" - $"med")).as("mad"), max($"med").as("med"))
    ev.join(broadcast(mad), "event_type")
      .where(abs($"value" - $"med") > lit(3.0 * 1.4826) * $"mad")
      .select($"event_id", $"event_type", $"value",
        round(($"value" - $"med") / (lit(1.4826) * $"mad"), 4).as("z"))
      .orderBy($"event_id")
  }

  private val q87Sql =
    """WITH med AS (
      |  SELECT event_type, median(value) AS med FROM events GROUP BY 1),
      |mad AS (
      |  SELECT e.event_type, median(abs(e.value - m.med)) AS mad,
      |         max(m.med) AS med
      |  FROM events e JOIN med m USING (event_type) GROUP BY 1)
      |SELECT e.event_id, e.event_type, e.value,
      |  round((e.value - m.med) / (1.4826 * m.mad), 4) AS z
      |FROM events e JOIN mad m USING (event_type)
      |WHERE abs(e.value - m.med) > (3 * 1.4826) * m.mad
      |ORDER BY e.event_id""".stripMargin

  // q89 — Bollinger bands (the canonical mean-reversion indicator: N-bar
  // moving average ± k·σ, John Bollinger 1980s): per-user bands over the
  // purchase-price series, N=10, k=2. Portability shape (q81's trick):
  // prices become integer CENTS, and the window sums Σy and Σy² are
  // exact BIGINT window aggregates in both engines — so mean and
  // variance come from the ALGEBRAIC identity n·Σy² − (Σy)² on exact
  // integers (order-independent; a float window sum would depend on each
  // engine's frame accumulation scheme), and the only float ops are the
  // final sqrt/divide, identical IEEE both sides. Only full windows
  // (n = N) emit — a 5-bar "10-bar band" is not a band. Scale: ONE
  // shuffle on the entity key serves all three window aggregates (same
  // frame, same Exchange); the frame is O(1) running state per row.
  private def q89(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(-9, Window.currentRow)
    t(s, dir, "events")
      .where($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value",
        round($"value" * 100, 0).cast("long").as("y"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sy", sum($"y").over(w))
      .withColumn("syy", sum($"y" * $"y").over(w))
      .where($"n" === 10)
      .withColumn("sigma", sqrt((lit(10.0) * $"syy" - $"sy" * $"sy")) / 1000.0)
      .select($"event_id", $"user_id", $"value",
        round($"sy" / 1000.0, 4).as("sma"),
        round($"sy" / 1000.0 + $"sigma" * 2.0, 4).as("upper_band"),
        round($"sy" / 1000.0 - $"sigma" * 2.0, 4).as("lower_band"),
        round(when(lit(10L) * $"syy" - $"sy" * $"sy" > 0,
          ($"value" - ($"sy" / 1000.0 - $"sigma" * 2.0)) / ($"sigma" * 4.0))
          .otherwise(lit(0.5)), 4).as("pct_b"))
      .orderBy($"event_id")
  }

  private val q89Sql =
    """WITH b AS (
      |  SELECT event_id, user_id, value,
      |    count(*) OVER w AS n,
      |    sum(CAST(round(value * 100, 0) AS BIGINT)) OVER w AS sy,
      |    sum(CAST(round(value * 100, 0) AS BIGINT) * CAST(round(value * 100, 0) AS BIGINT)) OVER w AS syy
      |  FROM events WHERE event_type = 'purchase'
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)),
      |s AS (
      |  SELECT event_id, user_id, value, sy, syy,
      |    sqrt(10.0 * syy - sy * sy) / 1000.0 AS sigma
      |  FROM b WHERE n = 10)
      |SELECT event_id, user_id, value,
      |  round(sy / 1000.0, 4) AS sma,
      |  round(sy / 1000.0 + 2.0 * sigma, 4) AS upper_band,
      |  round(sy / 1000.0 - 2.0 * sigma, 4) AS lower_band,
      |  round(CASE WHEN 10 * syy - sy * sy > 0
      |             THEN (value - (sy / 1000.0 - 2.0 * sigma)) / (4.0 * sigma)
      |             ELSE 0.5 END, 4) AS pct_b
      |FROM s ORDER BY event_id""".stripMargin

  // q90 — EWMA (exponentially weighted moving average, the other classic
  // smoother: RiskMetrics vol, MACD's building block). The textbook form
  // is recursive (ewma_t = α·x_t + (1−α)·ewma_{t−1}) — inexpressible as
  // a window function and sequential at 100 TB. The deployed shape is
  // the TRUNCATED kernel: weights (1−α)^i decay below 1% of the window
  // mass after K terms, so ewma_t ≈ Σ_{i<K} w_i·x_{t−i} / Σw_i — a pure
  // K-lag window expression, O(K) per row, embarrassingly parallel.
  // Engine portability: the float weights are pre-scaled to exact
  // integers (round(w_i·1e8)) in ONE place (Scala), and both the
  // DataFrame and the oracle SQL are generated from that same table —
  // every product/sum below is exact BIGINT arithmetic; the single
  // float divide at the end is IEEE-identical. K=8, span 8 (α=2/9).
  private val ewmaWeights: Seq[Long] =
    (0 until 8).map(i => math.round(math.pow(7.0 / 9.0, i) * 1e8))

  private def q90(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val terms = ewmaWeights.zipWithIndex.map { case (wt, i) =>
      if (i == 0) lit(wt) * $"y" else lit(wt) * lag($"y", i).over(w)
    }
    t(s, dir, "events")
      .where($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value",
        round($"value" * 100, 0).cast("long").as("y"))
      .withColumn("num", terms.reduce(_ + _))
      .where($"num".isNotNull)
      .select($"event_id", $"user_id", $"value",
        round($"num" / (ewmaWeights.sum * 100.0), 4).as("ewma"))
      .orderBy($"event_id")
  }

  private val q90Sql = {
    val terms = ewmaWeights.zipWithIndex.map { case (wt, i) =>
      if (i == 0) s"$wt * y" else s"$wt * lag(y, $i) OVER w"
    }.mkString(" + ")
    s"""WITH b AS (
       |  SELECT event_id, user_id, ts, value,
       |    CAST(round(value * 100, 0) AS BIGINT) AS y
       |  FROM events WHERE event_type = 'purchase'),
       |l AS (
       |  SELECT event_id, user_id, value, ($terms) AS num
       |  FROM b
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       |SELECT event_id, user_id, value,
       |  round(num / (${ewmaWeights.sum} * 100.0), 4) AS ewma
       |FROM l WHERE num IS NOT NULL ORDER BY event_id""".stripMargin
  }

  val defs: Seq[(String, QFn)] = Seq(
    "q89_bollinger" -> (q89 _),
    "q90_ewma" -> (q90 _),
    "q85_pii_redact" -> (q85 _),
    "q87_mad_outliers" -> (q87 _),
    "q81_regression" -> (q81 _),
    "q79_realized_vol" -> (q79 _),
    "q80_drawdown" -> (q80 _),
    "q77_histogram" -> (q77 _),
    "q73_funnel" -> (q73 _),
    "q74_retention" -> (q74 _),
    "q67_sessionization" -> (q67 _),
    "q71_time_range_window" -> (q71 _),
    "q47_scalar_subquery" -> (q47 _),
    "q48_recursive_cte" -> (q48 _),
    "q44_pivot" -> (q44 _),
    "q45_rank_family" -> (q45 _),
    "q46_edit_distance" -> (q46 _),
    "q40_range_join" -> (q40 _),
    "q30_multimodal_features" -> (q30 _),
    "q31_frame_sample" -> (q31 _),
    "q53_multimodal_decode" -> (q53 _),
    "q32_union_all" -> (q32 _),
    "q33_cube" -> (q33 _),
    "q34_grouping_sets" -> (q34 _),
    "q35_stats_agg" -> (q35 _),
    "q36_percentiles" -> (q36 _),
    "q49_percentiles_approx" -> (q49 _),
    "q52_promo_revenue" -> (q52 _),
    "q37_topk_per_group" -> (q37 _),
    "q38_monthly_revenue" -> (q38 _),
    "q39_approx_distinct" -> (q39 _))

  val oracle: Seq[(String, String)] = Seq(
    "q89_bollinger" -> q89Sql,
    "q90_ewma" -> q90Sql,
    "q85_pii_redact" -> q85Sql,
    "q87_mad_outliers" -> q87Sql,
    "q81_regression" -> q81Sql,
    "q79_realized_vol" -> q79Sql,
    "q80_drawdown" -> q80Sql,
    "q77_histogram" -> q77Sql,
    "q73_funnel" -> q73Sql,
    "q74_retention" -> q74Sql,
    "q67_sessionization" -> q67Sql,
    "q71_time_range_window" -> q71Sql,
    "q47_scalar_subquery" -> q47Sql,
    "q48_recursive_cte" -> q48Sql,
    "q44_pivot" -> q44Sql,
    "q45_rank_family" -> q45Sql,
    "q46_edit_distance" -> q46Sql,
    "q40_range_join" -> q40Sql,
    "q30_multimodal_features" -> q30Sql,
    "q31_frame_sample" -> q31Sql,
    "q53_multimodal_decode" -> q53Sql,
    "q32_union_all" -> q32Sql,
    "q33_cube" -> q33Sql,
    "q34_grouping_sets" -> q34Sql,
    "q35_stats_agg" -> q35Sql,
    "q36_percentiles" -> q36Sql,
    "q52_promo_revenue" -> q52Sql,
    "q37_topk_per_group" -> q37Sql,
    "q38_monthly_revenue" -> q38Sql)
}
