package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.AsOfJoin

/** Core relational operator catalog (SURVEY.md §2.1-§2.9): scans, filters,
  * aggregations, joins, windows, set ops, rollup, as-of join, resampling.
  *
  * Every query obeys the determinism contract (FIXTURES.md): total ORDER BY
  * ending in a unique key; money sums via exact DECIMAL(18,2) accumulation
  * (immune to double-summation order, which varies across Spark partial-agg
  * scheduling AND between engines) cast back to DOUBLE at the end; ns
  * timestamps compared on the raw epoch-ns Long (`ts_ns`, see Tables).
  *
  * Scale notes per query live in the Scaladoc — the small dims (region,
  * nation, supplier, customer at low SF) broadcast; big-big joins shuffle
  * once on the join key.
  */
object CoreQueries {
  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Exact money sum: DECIMAL(18,2) accumulation, DOUBLE result. */
  private def moneySum(c: org.apache.spark.sql.Column) =
    round(sum(c.cast("decimal(18,2)")), 2).cast("double")

  // q01 — TPC-H Q1-style pricing summary (A4/A6, P2). Partial agg map-side,
  // one shuffle on (returnflag, linestatus): 6 groups → trivially scalable.
  private def q01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1999-09-02"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").cast("double").as("sum_qty"),
        moneySum($"l_extendedprice").as("sum_base_price"),
        round(sum($"l_extendedprice".cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)"))), 2)
          .cast("double").as("sum_disc_price"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // q02 — per-part VWAP, global top-10 (A4 + O4 TakeOrderedAndProject:
  // true top-k, no full sort at scale).
  private def q02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_partkey")
      .agg(round(sum($"l_extendedprice" * $"l_quantity") / sum($"l_quantity"), 4)
        .as("vwap"))
      .orderBy($"vwap".desc, $"l_partkey")
      .limit(10)
  }

  private val q02Sql =
    """SELECT l_partkey,
      |  round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS vwap
      |FROM lineitem GROUP BY l_partkey
      |ORDER BY vwap DESC, l_partkey LIMIT 10""".stripMargin

  // q03 — filter + projection pushdown on events (P1-P4, P7): predicate and
  // 4-of-7 column read reach the parquet scan (verified via explain).
  private def q03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      // range filter on the RAW `ts` column (current testdata: parquet
      // timestamp[us] read natively): a predicate on the derived
      // ts_ns/ts_us expressions cannot be pushed to the parquet scan,
      // while this plain-column range is (verified in plan: PushedFilters
      // gets both bounds). The timestamp_micros(literal)s constant-fold
      // to timestamp literals; µs-range [a,b) == the old ns-range
      // [a*1000, b*1000) exactly, since `ts` is the µs floor.
      .filter($"event_type" === "purchase" &&
        $"ts" >= timestamp_micros(lit(1704844800000000L)) && // 2024-01-10T00:00Z
        $"ts" < timestamp_micros(lit(1705708800000000L)))    // 2024-01-20T00:00Z
      .select($"event_id", $"ts_us", $"user_id", round($"value", 4).as("value"))
      .orderBy($"event_id")
  }

  private val q03Sql =
    """SELECT event_id, epoch_us(ts) AS ts_us, user_id, round(value, 4) AS value
      |FROM events
      |WHERE event_type = 'purchase'
      |  AND epoch_us(ts) >= 1704844800000000 AND epoch_us(ts) < 1705708800000000
      |ORDER BY event_id""".stripMargin

  // q04 — snowflake dim join (J1/J2): nation & region broadcast (tiny at any
  // SF — 25/5 rows), so the only shuffle is the final 2-level groupBy.
  private def q04(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(t(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(count(lit(1)).as("customers"),
        moneySum($"c_acctbal").as("total_acctbal"))
      .orderBy($"r_name", $"n_name")
  }

  private val q04Sql =
    """SELECT r_name, n_name, count(*) AS customers,
      |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  // q05 — big-big join (J1): lineitem PRE-AGGREGATES to one revenue row
  // per l_orderkey BELOW the join (guide §2.3 "aggregate before you
  // shuffle" / §2.4): the join then matches orders 1:1, so the
  // count(DISTINCT o_orderkey) — whose planner expansion doubled the
  // aggregation — becomes a plain count (o_orderkey is the orders
  // primary key, and the pre-agg side is unique by construction), and
  // the exchange carries one row per order instead of one per line.
  // Values are identical: decimal addition is exact and associative, so
  // sum-of-per-order-sums == the flat sum (oracle hash-pinned).
  // At 100 TB both sides stay keyed on orderkey — one co-partitioned
  // shuffle each; at bench SF the 2-column orders side auto-broadcasts.
  private def q05(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lrev = t(s, dir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(sum($"l_extendedprice".cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)")))
        .as("rev"))
    t(s, dir, "orders")
      .select($"o_orderkey", $"o_orderpriority")
      .join(lrev, $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderpriority")
      .agg(
        round(sum($"rev"), 2).cast("double").as("revenue"),
        count($"o_orderkey").as("orders"))
      .orderBy($"o_orderpriority")
  }

  private val q05Sql =
    """SELECT o_orderpriority,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
      |  count(DISTINCT o_orderkey) AS orders
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // q06 — left outer join preserving customers with zero orders (J3).
  private def q06(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("order_cnt"))
      .orderBy($"order_cnt".desc, $"c_custkey")
      .limit(20)
  }

  private val q06Sql =
    """SELECT c_custkey, count(o_orderkey) AS order_cnt
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey ORDER BY order_cnt DESC, c_custkey LIMIT 20""".stripMargin

  // q07 — anti join (J4): customers with no order since 2001, per segment
  // (the date predicate keeps the result non-empty at every SF).
  private def q07(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val recent = t(s, dir, "orders").filter($"o_orderdate" >= lit("2001-01-01"))
    t(s, dir, "customer")
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"c_mktsegment")
  }

  private val q07Sql =
    """SELECT c_mktsegment, count(*) AS cnt
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |  AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // q08 — semi join: suppliers that shipped at least one lineitem (J4).
  private def q08(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "supplier")
      .join(t(s, dir, "lineitem"), $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_suppkey", $"s_name")
      .orderBy($"s_suppkey")
  }

  private val q08Sql =
    """SELECT s_suppkey, s_name FROM supplier s
      |WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey)
      |ORDER BY s_suppkey""".stripMargin

  // q09 — ROLLUP multi-granularity aggregation (A9).
  private def q09(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("cnt"), moneySum($"o_totalprice").as("total_price"))
      .select(
        coalesce($"o_orderstatus", lit("(all)")).as("status"),
        coalesce($"o_orderpriority", lit("(all)")).as("priority"),
        $"cnt", $"total_price")
      .orderBy($"status", $"priority")
  }

  private val q09Sql =
    """SELECT COALESCE(o_orderstatus, '(all)') AS status,
      |  COALESCE(o_orderpriority, '(all)') AS priority,
      |  count(*) AS cnt,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price
      |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  // q10 — exact distinct aggregation (A8). (HLL approx variant is
  // library-side; exact form is the oracle-comparable one.)
  private def q10(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .groupBy($"o_orderstatus")
      .agg(countDistinct($"o_custkey").as("distinct_custs"),
        count(lit(1)).as("cnt"))
      .orderBy($"o_orderstatus")
  }

  private val q10Sql =
    """SELECT o_orderstatus, count(DISTINCT o_custkey) AS distinct_custs,
      |  count(*) AS cnt
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // q11 — INTERSECT: nations present on both customer and supplier side.
  private def q11(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = t(s, dir, "customer").select($"c_nationkey".as("nk")).distinct()
    val su = t(s, dir, "supplier").select($"s_nationkey".as("nk")).distinct()
    c.intersect(su)
      .join(broadcast(t(s, dir, "nation")), $"nk" === $"n_nationkey")
      .select($"n_name")
      .orderBy($"n_name")
  }

  private val q11Sql =
    """WITH nk_both AS (
      |  SELECT DISTINCT c_nationkey AS nk FROM customer
      |  INTERSECT
      |  SELECT DISTINCT s_nationkey AS nk FROM supplier)
      |SELECT n_name FROM nation JOIN nk_both ON nk = n_nationkey
      |ORDER BY n_name""".stripMargin

  // q12 — EXCEPT: calendar days with shipments but no new orders
  // (non-empty at every SF: shipdates extend past the last orderdate).
  private def q12(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ship = t(s, dir, "lineitem").select(to_date($"l_shipdate").as("d")).distinct()
    val ord = t(s, dir, "orders").select(to_date($"o_orderdate").as("d")).distinct()
    ship.except(ord)
      .select(date_format($"d", "yyyy-MM-dd").as("day"))
      .orderBy($"day")
  }

  private val q12Sql =
    """WITH d AS (
      |  SELECT DISTINCT CAST(l_shipdate AS DATE) AS d FROM lineitem
      |  EXCEPT
      |  SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)
      |SELECT CAST(d AS VARCHAR) AS day FROM d ORDER BY day""".stripMargin

  // q13 — sequence-gap detection via lag() (W1): top-20 inter-event gaps
  // per user. Gaps are exact µs integers → fully deterministic.
  private def q13(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    t(s, dir, "events")
      .withColumn("gap_us", $"ts_us" - lag($"ts_us", 1).over(w))
      .filter($"gap_us".isNotNull)
      .select($"user_id", $"event_id", $"gap_us")
      .orderBy($"gap_us".desc, $"event_id")
      .limit(20)
  }

  private val q13Sql =
    """WITH g AS (
      |  SELECT user_id, event_id,
      |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
      |  FROM events)
      |SELECT user_id, event_id, gap_us FROM g WHERE gap_us IS NOT NULL
      |ORDER BY gap_us DESC, event_id LIMIT 20""".stripMargin

  // q14 — moving average over last 5 events per user (W4).
  private def q14(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      .rowsBetween(-4, 0)
    t(s, dir, "events")
      .filter($"user_id" < 20)
      .withColumn("ma5", round(avg($"value").over(w), 4))
      .select($"user_id", $"event_id", $"ts_us", $"ma5")
      .orderBy($"user_id", $"ts_us", $"event_id")
  }

  private val q14Sql =
    """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |  round(avg(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS ma5
      |FROM events WHERE user_id < 20
      |ORDER BY user_id, ts_us, event_id""".stripMargin

  // q15 — running (cumulative) sum per user (W5).
  private def q15(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    t(s, dir, "events")
      .filter($"user_id" < 20)
      .withColumn("running_value", round(sum($"value").over(w), 4))
      .select($"user_id", $"event_id", $"running_value")
      .orderBy($"user_id", $"event_id")
  }

  private val q15Sql =
    """SELECT user_id, event_id,
      |  round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value
      |FROM events WHERE user_id < 20
      |ORDER BY user_id, event_id""".stripMargin

  // q16 — JSON extraction from events.props (F9): integer sums → exact.
  private def q16(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("cnt"), sum($"k").as("sum_k"),
        round(avg($"k"), 4).as("avg_k"))
      .orderBy($"event_type")
  }

  // DuckDB sum(BIGINT) yields HUGEINT → explicit BIGINT cast for hash parity.
  private val q16Sql =
    """SELECT event_type, count(*) AS cnt,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // q17 — as-of join (J5): each purchase matched to the user's latest
  // at-or-before view event. See operators.AsOfJoin for the scale story.
  private def q17(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "events")
    val p = e.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id".as("p_user"), $"ts_us".as("p_ts"))
    val v = e.filter($"event_type" === "view")
      .select($"event_id".as("v_id"), $"user_id".as("v_user"),
        $"ts_us".as("v_ts"), $"value".as("v_value"))
    // no-match rows surface as -1/-1.0 sentinels: NULL floats hash as NaN
    // and NaN != NaN under exact comparison, which would false-fail an
    // engine-differential compare on genuinely-equal results.
    AsOfJoin.backward(p, v, Seq(("p_user", "v_user")), "p_ts", "v_ts",
        leftId = "p_id", tieBreaker = "v_id")
      .select($"p_id", $"p_user".as("user_id"), $"p_ts",
        coalesce($"v_id", lit(-1L)).as("v_id"),
        coalesce(round($"v_value", 4), lit(-1.0)).as("v_value"))
      .orderBy($"p_id")
  }

  private val q17Sql =
    """WITH p AS (SELECT event_id p_id, user_id p_user, epoch_us(ts) p_ts
      |           FROM events WHERE event_type = 'purchase'),
      |v AS (SELECT event_id v_id, user_id v_user, epoch_us(ts) v_ts, value v_value
      |      FROM events WHERE event_type = 'view'),
      |j AS (SELECT p.p_id, p.p_user, p.p_ts, v.v_id, v.v_value,
      |        row_number() OVER (PARTITION BY p.p_id ORDER BY v.v_ts DESC, v.v_id DESC) rn
      |      FROM p LEFT JOIN v ON p_user = v_user AND v_ts <= p_ts)
      |SELECT p_id, p_user AS user_id, p_ts, COALESCE(v_id, -1) AS v_id,
      |  COALESCE(round(v_value, 4), -1.0) AS v_value
      |FROM j WHERE rn = 1 ORDER BY p_id""".stripMargin

  // q18 — tick→bar OHLCV resampling (A7 batch form of streaming T3):
  // min_by/max_by on the unique ns timestamp give deterministic open/close.
  private def q18(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(
        min_by($"value", $"ts_us").as("open"),
        max($"value").as("high"),
        min($"value").as("low"),
        max_by($"value", $"ts_us").as("close"),
        count(lit(1)).as("n_events"),
        round(sum($"value"), 4).as("total_value"))
      .select($"event_type", date_format($"day", "yyyy-MM-dd").as("day"),
        $"open", $"high", $"low", $"close", $"n_events", $"total_value")
      .orderBy($"event_type", $"day")
  }

  private val q18Sql =
    """SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
      |  arg_min(value, epoch_us(ts)) AS open,
      |  max(value) AS high, min(value) AS low,
      |  arg_max(value, epoch_us(ts)) AS close,
      |  count(*) AS n_events,
      |  round(sum(value), 4) AS total_value
      |FROM events GROUP BY event_type, CAST(ts AS DATE)
      |ORDER BY event_type, day""".stripMargin

  val defs: Seq[(String, QFn)] = Seq(
    "q01_pricing_summary" -> (q01 _),
    "q02_vwap_topk" -> (q02 _),
    "q03_filter_project" -> (q03 _),
    "q04_dim_join" -> (q04 _),
    "q05_revenue_join" -> (q05 _),
    "q06_outer_join" -> (q06 _),
    "q07_anti_join" -> (q07 _),
    "q08_semi_join" -> (q08 _),
    "q09_rollup" -> (q09 _),
    "q10_distinct" -> (q10 _),
    "q11_intersect" -> (q11 _),
    "q12_except" -> (q12 _),
    "q13_window_gap" -> (q13 _),
    "q14_moving_avg" -> (q14 _),
    "q15_cumsum" -> (q15 _),
    "q16_json_extract" -> (q16 _),
    "q17_asof_join" -> (q17 _),
    "q18_resample_bars" -> (q18 _))

  val oracle: Seq[(String, String)] = Seq(
    "q01_pricing_summary" -> q01Sql,
    "q02_vwap_topk" -> q02Sql,
    "q03_filter_project" -> q03Sql,
    "q04_dim_join" -> q04Sql,
    "q05_revenue_join" -> q05Sql,
    "q06_outer_join" -> q06Sql,
    "q07_anti_join" -> q07Sql,
    "q08_semi_join" -> q08Sql,
    "q09_rollup" -> q09Sql,
    "q10_distinct" -> q10Sql,
    "q11_intersect" -> q11Sql,
    "q12_except" -> q12Sql,
    "q13_window_gap" -> q13Sql,
    "q14_moving_avg" -> q14Sql,
    "q15_cumsum" -> q15Sql,
    "q16_json_extract" -> q16Sql,
    "q17_asof_join" -> q17Sql,
    "q18_resample_bars" -> q18Sql)
}
