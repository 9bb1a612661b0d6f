package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Douglas–Peucker line simplification over centi-unit integer
  * coordinates — the `ST_Simplify` capability behind the reference
  * stack's GENERALIZED layers (PgOSM Flex ships low-zoom generalized
  * water/admin/road tables; PostGIS generalization is the documented
  * mechanism, `/root/reference/README.md:80-82` geometry store).
  *
  * Returns the 0-based indices of the points KEPT (ascending; endpoints
  * always kept), so the caller slices its own parallel arrays/structs —
  * one kernel serves lon/lat pairs, tagged point structs, or any other
  * row layout.
  *
  * Exactness: a point survives iff its squared perpendicular deviation
  * from the current chord exceeds tol² — evaluated as
  * `cross² > tol² · |AB|²` in double arithmetic of exactly-representable
  * integers (|cross| ≤ ~1.2·10⁹ fits a double's 53-bit mantissa up to
  * ~9·10¹⁵; products are correctly-rounded doubles of the same inputs on
  * every executor, so the verdict is deterministic under any
  * partitioning). Degenerate chords (A == B) fall back to point
  * distance. Iterative explicit stack — no recursion depth hazard on
  * pathological inputs.
  */
case class SimplifyIndices(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val arrOk = Seq(first, second).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (arrOk && third.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>, bigint tolerance), got " +
        children.map(_.dataType.simpleString).mkString("(", ", ", ")"))
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "simplify_indices"

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    SimplifyIndices.simplify(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], c.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lons, lats, tol) =>
      s"${ev.value} = graft.functions.SimplifyIndices.simplify($lons, $lats, $tol);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object SimplifyIndices {
  def apply(lons: Column, lats: Column, tol: Column): Column =
    GraftColumnBridge.column(SimplifyIndices(
      GraftColumnBridge.expression(lons), GraftColumnBridge.expression(lats),
      GraftColumnBridge.expression(tol)))

  /** Squared deviation of P from chord A→B (point distance if A == B),
    * times |AB|² — compared against tol²·|AB|² by the caller so no
    * division ever happens. */
  private def devCmp(ax: Long, ay: Long, bx: Long, by: Long,
                     px: Long, py: Long, tol: Long): Boolean = {
    val dx = (bx - ax).toDouble
    val dy = (by - ay).toDouble
    val len2 = dx * dx + dy * dy
    if (len2 == 0.0) {
      val ex = (px - ax).toDouble
      val ey = (py - ay).toDouble
      ex * ex + ey * ey > tol.toDouble * tol.toDouble
    } else {
      val cross = dx * (ay - py).toDouble - (ax - px).toDouble * dy
      cross * cross > tol.toDouble * tol.toDouble * len2
    }
  }

  /** Shared eval/codegen kernel. */
  def simplify(lons: ArrayData, lats: ArrayData, tol: Long): ArrayData = {
    val n = math.min(lons.numElements(), lats.numElements())
    if (n <= 2) return UnsafeArrayData.fromPrimitiveArray(Array.range(0, n))
    val keep = new Array[Boolean](n)
    keep(0) = true
    keep(n - 1) = true
    var stack = List((0, n - 1))
    while (stack.nonEmpty) {
      val (i, j) = stack.head
      stack = stack.tail
      if (j - i > 1) {
        val ax = lons.getLong(i); val ay = lats.getLong(i)
        val bx = lons.getLong(j); val by = lats.getLong(j)
        var worst = -1
        var worstDev = -1.0
        var k = i + 1
        while (k < j) {
          val px = lons.getLong(k); val py = lats.getLong(k)
          // track the max squared deviation·|AB|² (monotone in the true
          // deviation for a fixed chord, so argmax is exact)
          val dx = (bx - ax).toDouble; val dy = (by - ay).toDouble
          val dev =
            if (dx == 0.0 && dy == 0.0) {
              val ex = (px - ax).toDouble; val ey = (py - ay).toDouble
              ex * ex + ey * ey
            } else {
              val cross = dx * (ay - py).toDouble - (ax - px).toDouble * dy
              cross * cross
            }
          if (dev > worstDev) { worstDev = dev; worst = k }
          k += 1
        }
        if (worst >= 0 &&
            devCmp(ax, ay, bx, by, lons.getLong(worst), lats.getLong(worst), tol)) {
          keep(worst) = true
          stack = (i, worst) :: (worst, j) :: stack
        }
      }
    }
    val out = Array.newBuilder[Int]
    var i = 0
    while (i < n) { if (keep(i)) out += i; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out.result())
  }
}
