package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders, functions => F}

/** Typed UDAF (SURVEY.md §2.D `agg_udaf_typed`, §2.L `udaf_aggregator`):
  * size-weighted average price.
  *
  * Stand-in for the reference's custom folds (weighted centroid of member
  * nodes during geometry assembly, `/root/reference/README.md:80-81`).
  * The buffer keeps exact integer cents so the fold is associative and
  * order-independent — merge order varies run-to-run under partial
  * aggregation, and at 100 TB everything is merged across ~1000 executors.
  */
object WeightedAvg extends Aggregator[(Double, Int), (Long, Long), Double] {
  override def zero: (Long, Long) = (0L, 0L)

  override def reduce(b: (Long, Long), in: (Double, Int)): (Long, Long) =
    (b._1 + math.round(in._1 * 100) * in._2, b._2 + in._2)

  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(r: (Long, Long)): Double =
    if (r._2 == 0) Double.NaN
    else math.round((r._1.toDouble / 100.0) / r._2 * 10000.0) / 10000.0

  override def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form: weighted_avg(value, weight). */
  def apply(value: Column, weight: Column): Column = {
    val u = F.udaf(WeightedAvg)
    u(value, weight)
  }
}
