package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Exact point-in-ring test (crossing number) over integer centi-unit
  * coordinates — the `ST_Contains(polygon, point)` kernel of the
  * reference's terminal store ("amenable to efficient querying" in
  * PostGIS, `/root/reference/README.md:70`; geometry store
  * `README.md:80-82`).
  *
  * `(ringLons, ringLats)` is a CLOSED ring (first == last, the area
  * operators' convention); `(px, py)` the query point. A ray from the
  * point toward +x crosses edge (x₁,y₁)→(x₂,y₂) iff the edge straddles
  * py (half-open: `y₁ > py ≠ y₂ > py`, which also skips horizontal
  * edges and counts shared vertices once) and the signed cross product
  * `((x₁−px)(y₂−y₁) + (x₂−x₁)(py−y₁))·(y₂−y₁) > 0` — entirely LONG
  * arithmetic (|coord| ≤ ~2·10⁵ centi-units → products ≤ ~10¹¹, far
  * inside long range), so the verdict is bit-identical across engines
  * and partitionings; boundary points are consistently OUTSIDE (strict
  * inequality). Odd crossings = inside.
  *
  * This is the per-candidate kernel behind `osm_point_in_polygon`: grid
  * blocking proposes (point, polygon) pairs, this expression decides
  * them inside whole-stage codegen — no UDF, no interpreted lambda in
  * the hot path.
  */
case class PointInRing(first: Expression, second: Expression, third: Expression, fourth: Expression)
  extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ringsOk = Seq(first, second).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    val ptOk = Seq(third, fourth).forall(_.dataType == LongType)
    if (ringsOk && ptOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>, bigint, bigint), got " +
        children.map(_.dataType.simpleString).mkString("(", ", ", ")"))
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "point_in_ring"

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    PointInRing.contains(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[Long], d.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lons, lats, px, py) =>
      s"${ev.value} = graft.functions.PointInRing.contains($lons, $lats, $px, $py);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

object PointInRing {
  def apply(ringLons: Column, ringLats: Column, px: Column, py: Column): Column =
    GraftColumnBridge.column(PointInRing(
      GraftColumnBridge.expression(ringLons), GraftColumnBridge.expression(ringLats),
      GraftColumnBridge.expression(px), GraftColumnBridge.expression(py)))

  /** Shared eval/codegen kernel (static call keeps codegen bodies tiny). */
  def contains(lons: ArrayData, lats: ArrayData, px: Long, py: Long): Boolean = {
    val n = math.min(lons.numElements(), lats.numElements())
    var crossings = 0
    var i = 1
    while (i < n) {
      val x1 = lons.getLong(i - 1); val y1 = lats.getLong(i - 1)
      val x2 = lons.getLong(i); val y2 = lats.getLong(i)
      if ((y1 > py) != (y2 > py)) {
        val t = (x1 - px) * (y2 - y1) + (x2 - x1) * (py - y1)
        if (t * (y2 - y1) > 0) crossings += 1
      }
      i += 1
    }
    (crossings & 1) == 1
  }
}
