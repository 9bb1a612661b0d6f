package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StructType}

/** Ring-exact ST_Intersects decision of `osm_poly_overlaps`, fused: two
  * closed rings intersect iff (a) some edge pair intersects — the
  * 4-orientation test plus the four collinear endpoint-on-segment
  * touches, all exact Long cross products (≤ 7e13, inside 63 bits), or
  * (b) a VERTEX of one ring lies strictly inside the other by
  * crossing-number parity. Children: (aedges, averts, bedges, bverts) —
  * the vertex arrays ride separately because a degenerate 1-point ring
  * has a vertex but NO edges (seen live at sf0.01: ways 2495/9980 pair
  * by containment only; an edges-derived vertex set silently drops
  * them). Identical decision rule, branch for branch, as the SQL
  * template the DuckDB oracle keeps (OsmKernels.segInt / insideCase);
  * RingsIntersectSpec pins native ≡ template over random
  * self-intersecting rings INCLUDING 1-point degenerates — integers
  * throughout, so equality is exact, not IEEE-lucky.
  *
  * Why a native expression: the template form is exists-within-exists
  * over interpreted lambdas (the RollingHash/PolyPairPass lesson); this
  * is one fused short-circuiting loop.
  */
case class RingsIntersect(first: Expression, second: Expression,
                          third: Expression, fourth: Expression)
  extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    children.map(_.dataType) match {
      case Seq(ArrayType(_: StructType, _), ArrayType(_: StructType, _),
               ArrayType(_: StructType, _), ArrayType(_: StructType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case ts => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires four array<struct> inputs (aedges, averts, bedges, bverts), got ${ts.map(_.simpleString).mkString(", ")}")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "rings_intersect"

  override def nullSafeEval(ae: Any, av: Any, be: Any, bv: Any): Any =
    RingsIntersect.decide(ae.asInstanceOf[ArrayData], av.asInstanceOf[ArrayData],
                          be.asInstanceOf[ArrayData], bv.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ae, av, be, bv) =>
      s"${ev.value} = graft.functions.RingsIntersect.decide($ae, $av, $be, $bv);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

object RingsIntersect {
  def apply(aedges: Column, averts: Column, bedges: Column, bverts: Column): Column =
    GraftColumnBridge.column(RingsIntersect(
      GraftColumnBridge.expression(aedges), GraftColumnBridge.expression(averts),
      GraftColumnBridge.expression(bedges), GraftColumnBridge.expression(bverts)))

  private def flat(a: ArrayData, w: Int): Array[Long] = {
    val n = a.numElements()
    val out = new Array[Long](w * n)
    var i = 0
    while (i < n) {
      val s = a.getStruct(i, w)
      var j = 0
      while (j < w) { out(w * i + j) = s.getLong(j); j += 1 }
      i += 1
    }
    out
  }

  private def onSeg(px: Long, py: Long, x1: Long, y1: Long, x2: Long, y2: Long): Boolean =
    px >= math.min(x1, x2) && px <= math.max(x1, x2) &&
      py >= math.min(y1, y2) && py <= math.max(y1, y2)

  /** segInt: proper crossing or collinear endpoint touch. */
  private def segCross(ax1: Long, ay1: Long, ax2: Long, ay2: Long,
                       bx1: Long, by1: Long, bx2: Long, by2: Long): Boolean = {
    def orient(ox: Long, oy: Long, px: Long, py: Long, qx: Long, qy: Long): Long =
      (px - ox) * (qy - oy) - (py - oy) * (qx - ox)
    val d1 = orient(bx1, by1, bx2, by2, ax1, ay1)
    val d2 = orient(bx1, by1, bx2, by2, ax2, ay2)
    val d3 = orient(ax1, ay1, ax2, ay2, bx1, by1)
    val d4 = orient(ax1, ay1, ax2, ay2, bx2, by2)
    (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
      ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) ||
      (d1 == 0 && onSeg(ax1, ay1, bx1, by1, bx2, by2)) ||
      (d2 == 0 && onSeg(ax2, ay2, bx1, by1, bx2, by2)) ||
      (d3 == 0 && onSeg(bx1, by1, ax1, ay1, ax2, ay2)) ||
      (d4 == 0 && onSeg(bx2, by2, ax1, ay1, ax2, ay2))
  }

  /** crossing-number parity of vertex (px, py) against the edge list. */
  private def inside(px: Long, py: Long, es: Array[Long]): Boolean = {
    var cnt = 0L
    var i = 0
    val n = es.length / 4
    while (i < n) {
      val x1 = es(4 * i); val y1 = es(4 * i + 1)
      val x2 = es(4 * i + 2); val y2 = es(4 * i + 3)
      if ((y1 > py) != (y2 > py) &&
          ((x1 - px) * (y2 - y1) + (x2 - x1) * (py - y1)) * (y2 - y1) > 0) cnt += 1
      i += 1
    }
    cnt % 2 == 1
  }

  def decide(aEdges: ArrayData, aVerts: ArrayData,
             bEdges: ArrayData, bVerts: ArrayData): Boolean = {
    val as = flat(aEdges, 4); val bs = flat(bEdges, 4)
    val avs = flat(aVerts, 2); val bvs = flat(bVerts, 2)
    val nA = as.length / 4; val nB = bs.length / 4
    var i = 0
    while (i < nA) {
      var j = 0
      while (j < nB) {
        if (segCross(as(4 * i), as(4 * i + 1), as(4 * i + 2), as(4 * i + 3),
                     bs(4 * j), bs(4 * j + 1), bs(4 * j + 2), bs(4 * j + 3))) return true
        j += 1
      }
      i += 1
    }
    i = 0
    while (i < avs.length / 2) {
      if (inside(avs(2 * i), avs(2 * i + 1), bs)) return true
      i += 1
    }
    i = 0
    while (i < bvs.length / 2) {
      if (inside(bvs(2 * i), bvs(2 * i + 1), as)) return true
      i += 1
    }
    false
  }
}
