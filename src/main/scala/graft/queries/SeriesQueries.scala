package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Time-series / technical-indicator extension rows (W-family): RSI,
  * MACD, forward-fill (LOCF), and TWAP over the per-user event-value
  * series — the indicator surface a market-data lakehouse user runs
  * daily (reference scope: README.md's OHLCV + quant-analytics tier;
  * q89 Bollinger / q90 EWMA are the siblings).
  *
  * Engine-portability contract (q81/q89/q90's): prices become integer
  * CENTS, window/aggregate state is exact integer arithmetic in BOTH
  * engines, and the only float ops are final divides written as the
  * same IEEE expression tree on each side. Where a kernel or weight
  * table exists (q96), ONE Scala value generates both the DataFrame
  * terms and the oracle SQL, so the engines cannot disagree.
  *
  * Scale shape shared by all four: ONE shuffle on the entity key
  * serves every window/aggregate (same partitioning, Exchange reuse —
  * the q67/q79 contract); frames are O(1)-or-O(K) running state per
  * row; no joins, no driver state.
  */
object SeriesQueries {
  import CoreQueries.QFn

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  // q95 — RSI (relative strength index, Cutler's SMA form, N=14). The
  // classic Wilder smoothing is recursive (sequential at scale); the
  // SMA form is the window-expressible one actually deployed for batch
  // scans: RSI = 100·ΣG/(ΣG+ΣL) over the last 14 deltas, where
  // G/L are the positive/negative parts of the one-step cent delta —
  // all exact BIGINT until the single final divide. Only full windows
  // emit (a 5-delta "14-delta RSI" is not an RSI); an all-flat window
  // (ΣG+ΣL = 0) pins to the neutral 50.
  private def q95(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val f = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(-13, Window.currentRow)
    t(s, dir, "events")
      .select($"event_id", $"user_id", $"ts", $"value",
        round($"value" * 100, 0).cast("long").as("y"))
      .withColumn("d", $"y" - lag($"y", 1).over(w))
      .withColumn("g", when($"d" > 0, $"d").otherwise(lit(0L)))
      .withColumn("l", when($"d" < 0, -$"d").otherwise(lit(0L)))
      .withColumn("nd", count($"d").over(f))
      .withColumn("sg", sum(when($"d".isNotNull, $"g")).over(f))
      .withColumn("sl", sum(when($"d".isNotNull, $"l")).over(f))
      .where($"nd" === 14)
      .select($"event_id", $"user_id", $"value",
        round(when($"sg" + $"sl" === 0, lit(50.0))
          .otherwise(lit(100.0) * $"sg" / ($"sg" + $"sl")), 4).as("rsi"))
      .orderBy($"event_id")
  }

  private val q95Sql =
    """WITH d AS (
      |  SELECT event_id, user_id, ts, value,
      |    CAST(round(value * 100, 0) AS BIGINT)
      |      - lag(CAST(round(value * 100, 0) AS BIGINT)) OVER w AS d
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |f AS (
      |  SELECT event_id, user_id, value,
      |    count(d) OVER fr AS nd,
      |    sum(CASE WHEN d > 0 THEN d ELSE 0 END) OVER fr AS sg,
      |    sum(CASE WHEN d < 0 THEN -d ELSE 0 END) OVER fr AS sl
      |  FROM d
      |  WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
      |                ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
      |SELECT event_id, user_id, value,
      |  round(CASE WHEN sg + sl = 0 THEN 50.0
      |             ELSE 100.0 * sg / (sg + sl) END, 4) AS rsi
      |FROM f WHERE nd = 14 ORDER BY event_id""".stripMargin

  // q96 — MACD (Appel's moving-average convergence/divergence: EWMA12 −
  // EWMA26, signal = EWMA9 of the MACD line, histogram = MACD − signal).
  // Both EWMAs use q90's truncated-kernel form — the recursive
  // definition is sequential; the K-lag kernel is a pure window
  // expression, O(K) per row. The kernels are exact-integer weight
  // tables (round(w·1e8)) defined ONCE here and expanded into both the
  // DataFrame terms and the oracle SQL, so the term order — and hence
  // the float expression tree — is identical across engines. The signal
  // line is a second window pass over the (rounded) MACD series: same
  // partitioning, so Spark reuses the first pass's Exchange — the whole
  // query is scan → one shuffle → two Window stages.
  private def kernel(span: Int, k: Int): IndexedSeq[Long] = {
    val a = (span.toDouble - 1.0) / (span.toDouble + 1.0)
    (0 until k).map(i => math.round(math.pow(a, i) * 1e8))
  }
  private val fastW = kernel(12, 12)   // (11/13)^i
  private val slowW = kernel(26, 26)   // (25/27)^i
  private val sigW = kernel(9, 8)      // (8/10)^i

  private def q96(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    def kernelTerms(ws: Seq[Long], col: org.apache.spark.sql.Column) =
      ws.zipWithIndex.map { case (wt, i) =>
        if (i == 0) lit(wt) * col else lit(wt) * lag(col, i).over(w)
      }.reduce(_ + _)
    // Window expressions are projected BEFORE the filter (a window fn is
    // illegal inside a Filter condition) — same shape as the oracle SQL's
    // `deep`/`deepm` columns.
    val macd = t(s, dir, "events")
      .select($"event_id", $"user_id", $"ts",
        round($"value" * 100, 0).cast("long").as("y"))
      .withColumn("numf", kernelTerms(fastW, $"y"))
      .withColumn("nums", kernelTerms(slowW, $"y"))
      .withColumn("deep", lag($"y", slowW.size - 1).over(w))
      .where($"deep".isNotNull)
      .select($"event_id", $"user_id", $"ts",
        round($"numf" / (fastW.sum * 100.0) - $"nums" / (slowW.sum * 100.0), 6)
          .as("macd"))
    macd
      .withColumn("signum", kernelTerms(sigW, $"macd"))
      .withColumn("deepm", lag($"macd", sigW.size - 1).over(w))
      .where($"deepm".isNotNull)
      .select($"event_id", $"user_id", $"macd",
        round($"signum" / sigW.sum.toDouble, 6).as("signal"))
      .withColumn("histogram", round($"macd" - $"signal", 6))
      .orderBy($"event_id")
  }

  private val q96Sql = {
    def terms(ws: Seq[Long], col: String) = ws.zipWithIndex.map { case (wt, i) =>
      if (i == 0) s"$wt * $col" else s"$wt * lag($col, $i) OVER w"
    }.mkString(" + ")
    s"""WITH b AS (
       |  SELECT event_id, user_id, ts,
       |    CAST(round(value * 100, 0) AS BIGINT) AS y
       |  FROM events),
       |m AS (
       |  SELECT event_id, user_id, ts,
       |    round((${terms(fastW, "y")}) / (${fastW.sum} * 100.0)
       |        - (${terms(slowW, "y")}) / (${slowW.sum} * 100.0), 6) AS macd,
       |    lag(y, ${slowW.size - 1}) OVER w AS deep
       |  FROM b
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |g AS (SELECT event_id, user_id, ts, macd FROM m WHERE deep IS NOT NULL),
       |sig AS (
       |  SELECT event_id, user_id, macd,
       |    round((${terms(sigW, "macd")}) / ${sigW.sum}.0, 6) AS signal,
       |    lag(macd, ${sigW.size - 1}) OVER w AS deepm
       |  FROM g
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       |SELECT event_id, user_id, macd, signal,
       |  round(macd - signal, 6) AS histogram
       |FROM sig WHERE deepm IS NOT NULL ORDER BY event_id""".stripMargin
  }

  // q97 — forward-fill / LOCF (last observation carried forward): carry
  // each user's most recent purchase price (and its timestamp) onto
  // every subsequent event — the canonical time-series gap-fill and the
  // batch twin of the streaming quote-state join (T8). Pure running
  // window state: `last(..., ignoreNulls)` over an unbounded-preceding
  // frame is O(1) per row and needs ONE shuffle on the entity key;
  // DuckDB's `last_value(x IGNORE NULLS)` is the same operator. Rows
  // before a user's first purchase have no fill and are dropped (LOCF
  // has nothing to carry). staleness_us — how old the carried price
  // is — falls out of the same fill applied to the timestamp.
  private def q97(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val f = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .select($"event_id", $"user_id", $"event_type", $"ts", $"value",
        when($"event_type" === "purchase", $"value").as("px"),
        when($"event_type" === "purchase", unix_micros($"ts")).as("pts"))
      .withColumn("last_px", last($"px", ignoreNulls = true).over(f))
      .withColumn("last_ts", last($"pts", ignoreNulls = true).over(f))
      .where($"last_px".isNotNull)
      .select($"event_id", $"user_id", $"event_type",
        round($"last_px", 2).as("last_px"),
        (unix_micros($"ts") - $"last_ts").as("staleness_us"))
      .orderBy($"event_id")
  }

  private val q97Sql =
    """WITH f AS (
      |  SELECT event_id, user_id, event_type, ts,
      |    last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
      |      OVER w AS last_px,
      |    last_value(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END IGNORE NULLS)
      |      OVER w AS last_ts
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_id, user_id, event_type,
      |  round(last_px, 2) AS last_px,
      |  epoch_us(ts) - last_ts AS staleness_us
      |FROM f WHERE last_px IS NOT NULL ORDER BY event_id""".stripMargin

  // q98 — TWAP (time-weighted average price) per (user, day): each
  // purchase price is weighted by how long it REMAINED the prevailing
  // price — lead(ts) − ts within the day, with the day's last price
  // holding until midnight (the execution-benchmark convention). All
  // state is exact integers: duration in µs (BIGINT), price in cents,
  // and the µs·cent products are summed as DECIMAL(38,0)/HUGEINT (q81's
  // contract — at 100 TB a day of µs-weighted cents overflows BIGINT;
  // DECIMAL(38,0) is the portable exact accumulator). One (user, day)
  // shuffle serves both the lead() window and the aggregate.
  private def q98(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id", $"day").orderBy($"ts", $"event_id")
    t(s, dir, "events")
      .where($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id",
        expr("unix_micros(ts) div 86400000000").as("day"),
        unix_micros($"ts").as("tus"),
        round($"value" * 100, 0).cast("long").as("y"))
      .withColumn("dur",
        coalesce(lead($"tus", 1).over(w), ($"day" + 1) * lit(86400000000L)) - $"tus")
      .groupBy($"user_id", $"day")
      .agg(count(lit(1)).as("n_trades"),
        round(sum(($"y" * $"dur").cast("decimal(38,0)")).cast("double") /
          (sum($"dur").cast("double") * 100.0), 4).as("twap"))
      .orderBy($"user_id", $"day")
  }

  private val q98Sql =
    """WITH p AS (
      |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
      |    epoch_us(ts) AS tus,
      |    CAST(round(value * 100, 0) AS BIGINT) AS y,
      |    ts, event_id
      |  FROM events WHERE event_type = 'purchase'),
      |d AS (
      |  SELECT user_id, day, y,
      |    coalesce(lead(tus) OVER (PARTITION BY user_id, day ORDER BY ts, event_id),
      |             (day + 1) * 86400000000) - tus AS dur
      |  FROM p)
      |SELECT user_id, day, count(*) AS n_trades,
      |  round(CAST(sum(CAST(y AS HUGEINT) * dur) AS DOUBLE)
      |      / (CAST(sum(dur) AS DOUBLE) * 100.0), 4) AS twap
      |FROM d GROUP BY user_id, day ORDER BY user_id, day""".stripMargin

  val defs: Seq[(String, QFn)] = Seq(
    "q95_rsi" -> (q95 _),
    "q96_macd" -> (q96 _),
    "q97_forward_fill" -> (q97 _),
    "q98_twap" -> (q98 _))

  val oracle: Seq[(String, String)] = Seq(
    "q95_rsi" -> q95Sql,
    "q96_macd" -> q96Sql,
    "q97_forward_fill" -> q97Sql,
    "q98_twap" -> q98Sql)
}
