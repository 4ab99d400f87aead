package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregate (SURVEY.md §2.11): exact VWAP as an
  * `Aggregator[IN, BUF, OUT]` — the user-facing UDAF surface. The buffer
  * (Σ price·volume, Σ volume) is algebraic, so Spark runs it as a partial
  * + final hash aggregate exactly like a built-in: map-side combine, one
  * shuffle on the grouping key, mergeable across any partitioning.
  *
  * (The catalog's VWAP queries use the composed built-in form
  * sum(p*v)/sum(v), which Catalyst codegens; this Aggregator exists for
  * the extensibility surface — streaming state merges, typed Datasets —
  * and is asserted equal to the built-in form in tests.)
  */
object VwapAggregator extends Aggregator[(Double, Double), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)

  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)

  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(b: (Double, Double)): Double = b._1 / b._2

  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Untyped Column form: vwap(price, volume). */
  def vwap(price: Column, volume: Column): Column =
    udaf(VwapAggregator).apply(price, volume)
}
