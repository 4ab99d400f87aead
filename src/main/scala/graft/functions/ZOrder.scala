package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton) clustering key — the multi-dimension data-skipping
  * curve the reference declares (`ZORDER BY (symbol)` —
  * /root/reference/README.md:125,134).
  *
  * Linear clustering by (symbol, timestamp) gives tight per-row-group
  * min/max stats on `symbol` but lets `timestamp` span the whole file in
  * every row group — a time-range predicate inside one date partition
  * skips nothing. Interleaving the bits of both dimensions' ranks makes
  * each row group a small HYPER-RECTANGLE of the (symbol × time) domain,
  * so min/max stats are partial in EVERY clustered dimension and either
  * predicate prunes row groups (at 100 TB: also whole files, since file
  * splits follow the same sort).
  *
  * Built entirely from codegen'd built-in expressions (shifts, masks,
  * ascii/substring) — no UDF, stays inside whole-stage codegen; ranks are
  * scaled against batch min/max computed in ONE small aggregate job per
  * write.
  */
object ZOrder {

  /** Interleave `ranks` (longs in [0, 2^bits)) bit-by-bit: bit b of rank
    * i lands at position b·n + i. Monotone in each rank with the others
    * fixed, so equal-prefix rows sort into contiguous hyper-rectangles.
    */
  def interleave(ranks: Seq[Column], bits: Int): Column = {
    val n = ranks.size
    require(n >= 1 && n * bits <= 63, s"$n cols x $bits bits exceeds a long")
    ranks.zipWithIndex.flatMap { case (r, i) =>
      (0 until bits).map { b =>
        shiftleft(shiftright(r, b).bitwiseAND(lit(1L)), b * n + i)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Linear rank of a numeric value within [lo, hi] scaled to
    * [0, 2^bits), clamped (degenerate lo == hi ranks everything 0).
    */
  def numericRank(v: Column, lo: Column, hi: Column, bits: Int): Column = {
    val top = (1L << bits) - 1
    val span = greatest(hi.cast("double") - lo.cast("double"), lit(1e-12))
    val scaled = ((v.cast("double") - lo.cast("double")) / span * top)
      .cast("long")
    coalesce(least(greatest(scaled, lit(0L)), lit(top)), lit(0L))
  }

  /** Order-preserving rank of a string by its first four bytes (big-
    * endian), shifted to `bits` — the HIGH-cardinality fallback. Weak
    * when values share a prefix (tickers "SY00".."SY31" collapse to one
    * rank); [[dictRank]] is the primary string path.
    */
  def stringRank(c: Column, bits: Int): Column = {
    val packed = (0 until 4).map { i =>
      coalesce(ascii(substring(c, i + 1, 1)).cast("long"), lit(0L)) *
        (1L << (8 * (3 - i)))
    }.reduce(_ + _)
    shiftright(packed, 32 - bits)
  }

  /** Exact dense rank of a LOW-cardinality string column (the z-order
    * case that matters: symbols, languages, venues): sorted distincts →
    * rank scaled across [0, 2^bits), applied per row as a literal-map
    * lookup (codegen'd, no join). Values unseen at rank time (can't
    * happen within one write batch) rank 0.
    */
  def dictRank(c: Column, sortedDistinct: Seq[String], bits: Int): Column = {
    val top = (1L << bits) - 1
    val n = sortedDistinct.size
    if (n == 0) return lit(0L) // empty batch: no values to rank
    val pairs = sortedDistinct.zipWithIndex.flatMap { case (v, i) =>
      Seq(lit(v), lit(if (n <= 1) 0L else i.toLong * top / (n - 1)))
    }
    coalesce(element_at(map(pairs: _*), c), lit(0L))
  }

  /** Distinct-count cap for [[dictRank]]'s literal map; beyond it the
    * prefix encoding takes over (z-ordering a high-cardinality string
    * dimension is rarely useful anyway).
    */
  val MaxDict = 1024

  /** The Z-key for `cols` of `df` (string / timestamp / numeric), ranks
    * scaled against the batch's own min/max — one narrow aggregate job,
    * then a pure codegen'd expression per row.
    */
  def zkey(df: DataFrame, cols: Seq[String], bitsPerDim: Int = 16): Column = {
    val bits = math.min(bitsPerDim, 63 / cols.size) // fit a long at any arity
    val numeric = cols.filterNot(c => df.schema(c).dataType == StringType)
    val stats: Map[String, (Column, Column)] =
      if (numeric.isEmpty) Map.empty
      else {
        val aggs = numeric.flatMap { c =>
          val v = asNumeric(df, c)
          Seq(min(v).as(s"__lo_$c"), max(v).as(s"__hi_$c"))
        }
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        numeric.zipWithIndex.map { case (c, i) =>
          c -> (lit(Option(row.get(2 * i)).getOrElse(0L)),
            lit(Option(row.get(2 * i + 1)).getOrElse(0L)))
        }.toMap
      }
    val ranks = cols.map { c =>
      df.schema(c).dataType match {
        case StringType =>
          val distinct = df.select(col(c)).na.drop().distinct()
            .limit(MaxDict + 1).collect().map(_.getString(0)).sorted.toSeq
          if (distinct.size > MaxDict) stringRank(col(c), bits)
          else dictRank(col(c), distinct, bits)
        case _ =>
          val (lo, hi) = stats(c)
          numericRank(asNumeric(df, c), lo, hi, bits)
      }
    }
    interleave(ranks, bits)
  }

  private def asNumeric(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case TimestampType => unix_millis(col(c))
      case DateType => col(c).cast("long")
      case _ => col(c).cast("double")
    }
}
