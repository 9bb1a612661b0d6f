package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StructType}

/** One-sided boundary integral of `osm_poly_pair_area` (see
  * `OsmKernels.pairPass` for the math): over `edges`, Σ_e (x1·y2 − y1·x2)
  * · measure{t ∈ [0,1] : winding weight of e(t) w.r.t. `others`}.
  *
  * Why a native expression: the SQL rendering nests five higher-order
  * lambdas (filter → transform → sort → zip_with → two aggregates) —
  * interpreted, alloc-heavy, and outside whole-stage codegen (the
  * RollingHash lesson; measured 5.3 s at sf0.1 for the pair key). This
  * is the SAME float dataflow as one fused loop: every operation below
  * mirrors the SQL template's literal order and associativity (Long
  * arithmetic for the crossing decisions, one Long→double conversion
  * per operand site, left-folded sums), so the result is bit-identical
  * to the interpreted form — PolyPairAreaSpec pins the equality on
  * fixture and pseudo-random self-intersecting polygons, and the DuckDB
  * oracle (which keeps the template) hash-matches at every sf.
  *
  * Inputs: two arrays of struct<x1,y1,x2,y2 : BIGINT> (closed-ring edge
  * lists). Null-free by construction upstream.
  */
case class PolyPairPass(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(_: StructType, _), ArrayType(_: StructType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<struct> edge lists, got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "poly_pair_pass"

  override def nullSafeEval(a: Any, b: Any): Any =
    PolyPairPass.pass(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.PolyPairPass.pass($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object PolyPairPass {
  def apply(edges: Column, others: Column): Column =
    GraftColumnBridge.column(PolyPairPass(
      GraftColumnBridge.expression(edges),
      GraftColumnBridge.expression(others)))

  /** Decode an edge array once into a flat Long[4n] (x1,y1,x2,y2, …). */
  private def flat(a: ArrayData): Array[Long] = {
    val n = a.numElements()
    val out = new Array[Long](4 * n)
    var i = 0
    while (i < n) {
      val s = a.getStruct(i, 4)
      out(4 * i) = s.getLong(0); out(4 * i + 1) = s.getLong(1)
      out(4 * i + 2) = s.getLong(2); out(4 * i + 3) = s.getLong(3)
      i += 1
    }
    out
  }

  def pass(edgesArr: ArrayData, othersArr: ArrayData): Double = {
    val es = flat(edgesArr); val os = flat(othersArr)
    val nE = es.length / 4; val nO = os.length / 4
    val ts = new Array[Double](nO + 2)
    var acc = 0.0
    var e = 0
    while (e < nE) {
      val ax1 = es(4 * e); val ay1 = es(4 * e + 1)
      val ax2 = es(4 * e + 2); val ay2 = es(4 * e + 3)
      val dax = ax2 - ax1; val day = ay2 - ay1
      // crossing parameters with `others`, decided in exact Long
      var nt = 0
      ts(nt) = 0.0; nt += 1
      var o = 0
      while (o < nO) {
        val bx1 = os(4 * o); val by1 = os(4 * o + 1)
        val bx2 = os(4 * o + 2); val by2 = os(4 * o + 3)
        val dbx = bx2 - bx1; val dby = by2 - by1
        val den = dax * dby - day * dbx
        if (den != 0L) {
          val tn = (bx1 - ax1) * dby - (by1 - ay1) * dbx
          val un = (bx1 - ax1) * day - (by1 - ay1) * dax
          // t ∈ [0,1] iff tn/den ∈ [0,1]: decided by SIGN AGREEMENT plus
          // |num| ≤ |den| — never by the product tn*den, whose magnitude
          // (~(4.4e18)² at fixture deltas) would wrap Long and corrupt
          // the decision silently (ADVICE r14). tn/un/den themselves
          // stay within Long by the coordinate-delta bound.
          val tIn = tn == 0L || (((tn > 0L) == (den > 0L)) &&
                                 math.abs(tn) <= math.abs(den))
          val uIn = un == 0L || (((un > 0L) == (den > 0L)) &&
                                 math.abs(un) <= math.abs(den))
          if (tIn && uIn) {
            ts(nt) = tn.toDouble / den.toDouble; nt += 1
          }
        }
        o += 1
      }
      // ascending sub-interval order: sort the interior params, bound by 1.0
      java.util.Arrays.sort(ts, 1, nt)
      ts(nt) = 1.0; nt += 1
      var measure = 0.0
      var i = 0
      while (i < nt - 1) {
        val t1 = ts(i); val t2 = ts(i + 1)
        val mid = (t1 + t2) * 0.5
        val px = ax1.toDouble + mid * dax.toDouble
        val py = ay1.toDouble + mid * day.toDouble
        var wind = 0.0
        var o2 = 0
        while (o2 < nO) {
          val bx1 = os(4 * o2); val by1 = os(4 * o2 + 1)
          val bx2 = os(4 * o2 + 2); val by2 = os(4 * o2 + 3)
          val lft = (bx2 - bx1).toDouble * (py - by1.toDouble) -
            (by2 - by1).toDouble * (px - bx1.toDouble)
          val w =
            if (by1.toDouble <= py && by2.toDouble > py && lft > 0.0) 1.0
            else if (by2.toDouble <= py && by1.toDouble > py && lft < 0.0) -1.0
            else 0.0
          wind += w
          o2 += 1
        }
        measure += (t2 - t1) * wind
        i += 1
      }
      acc += (ax1 * ay2 - ay1 * ax2).toDouble * measure
      e += 1
    }
    acc
  }
}
