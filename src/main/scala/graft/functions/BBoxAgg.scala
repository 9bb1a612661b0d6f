package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders, functions => F}

/** Typed bbox-union UDAF (SURVEY.md §2.L `udaf_aggregator`): folds points
  * into their bounding box — the envelope osm2pgsql maintains while
  * assembling way/relation geometry (`/root/reference/README.md:80-81`).
  *
  * Buffer is (minx, miny, maxx, maxy) in integer centi-units: min/max are
  * associative + commutative, so partial aggregation merges in any order
  * across executors.
  */
object BBoxAgg extends Aggregator[(Long, Long), (Long, Long, Long, Long), String] {
  override def zero: (Long, Long, Long, Long) =
    (Long.MaxValue, Long.MaxValue, Long.MinValue, Long.MinValue)

  override def reduce(b: (Long, Long, Long, Long), p: (Long, Long)): (Long, Long, Long, Long) =
    (math.min(b._1, p._1), math.min(b._2, p._2), math.max(b._3, p._1), math.max(b._4, p._2))

  override def merge(a: (Long, Long, Long, Long), b: (Long, Long, Long, Long)): (Long, Long, Long, Long) =
    (math.min(a._1, b._1), math.min(a._2, b._2), math.max(a._3, b._3), math.max(a._4, b._4))

  /** "BOX(minx miny, maxx maxy)" in units (centi-units / 100), rendered
    * with 2 decimals — exact, since the fold never leaves integers.
    */
  override def finish(r: (Long, Long, Long, Long)): String = {
    def f(c: Long): String = {
      val sign = if (c < 0) "-" else ""
      val a = math.abs(c)
      s"$sign${a / 100}.${"%02d".format(a % 100)}"
    }
    s"BOX(${f(r._1)} ${f(r._2)}, ${f(r._3)} ${f(r._4)})"
  }

  override def bufferEncoder: Encoder[(Long, Long, Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[String] = Encoders.STRING

  /** Column form: bbox(x_centi, y_centi). */
  def apply(x: Column, y: Column): Column = {
    val u = F.udaf(BBoxAgg)
    u(x, y)
  }
}
