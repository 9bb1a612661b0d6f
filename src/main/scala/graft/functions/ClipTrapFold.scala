package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused Green's-theorem tile-clip area fold — the native replacement
  * for osm_poly_clip_area's aggregate() lambda over [[ClipTrapFold]]'s
  * SQL twin (OsmKernels.clipTrapTerm). Higher-order lambdas evaluate
  * interpreted per (edge × tile); this is one tight loop per row.
  *
  * IEEE-exactness contract: every double operation below mirrors the
  * spliced SQL template op-for-op in the same order (long arithmetic
  * for the clamps, one cast per operand site, no fused multiply-add),
  * and the fold is the same left-associated acc + term sequence — so
  * the emitted double is bit-identical to the lambda's and the DuckDB
  * oracle's, which both engines round only at the readout.
  *
  * r20: was CodegenFallback (interpreted eval per row, which also
  * splits the surrounding whole-stage-codegen span); now generates a
  * call to the shared static kernel [[ClipTrapFold.compute]] — the
  * SAME Scala body runs on both paths, so bit-identity between eval
  * and codegen is structural, and the projection stays in one span.
  */
case class ClipTrapFold(edges: Expression, rx0: Expression, rx1: Expression,
                        ry0: Expression, ry1: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(edges, rx0, rx1, ry0, ry1)
  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "clip_trap_fold"

  // containsNull=true rejected (ADVICE r19) — see RingShoe: the loop's
  // getStruct().getLong() would NPE on a null element instead of the
  // lambda's null-propagation; the zip_with(named_struct) producer here
  // carries containsNull=false.
  override def checkInputDataTypes(): TypeCheckResult = edges.dataType match {
    case ArrayType(st: StructType, false) if st.length == 4 &&
      st.forall(_.dataType == LongType) =>
      if (Seq(rx0, rx1, ry0, ry1).forall(_.dataType == LongType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName bounds must be bigint")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<x1,y1,x2,y2: bigint>> " +
        s"with non-null elements, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val e = edges.eval(input)
    val a0 = rx0.eval(input); val a1 = rx1.eval(input)
    val b0 = ry0.eval(input); val b1 = ry1.eval(input)
    if (e == null || a0 == null || a1 == null || b0 == null || b1 == null) return null
    ClipTrapFold.compute(e.asInstanceOf[ArrayData],
      a0.asInstanceOf[Long], a1.asInstanceOf[Long],
      b0.asInstanceOf[Long], b1.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = children.map(_.genCode(ctx))
    val childCode = cs.map(_.code).reduce(_ + _)
    val anyNull = cs.map(_.isNull).mkString(" || ")
    val self = classOf[ClipTrapFold].getName.stripSuffix("$")
    ev.copy(code =
      code"""
        $childCode
        boolean ${ev.isNull} = $anyNull;
        double ${ev.value} = 0.0;
        if (!${ev.isNull}) {
          ${ev.value} = $self.compute(${cs(0).value},
            ${cs(1).value}, ${cs(2).value}, ${cs(3).value}, ${cs(4).value});
        }
      """)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ClipTrapFold =
    copy(edges = c(0), rx0 = c(1), rx1 = c(2), ry0 = c(3), ry1 = c(4))
}

object ClipTrapFold {
  /** Shared eval/codegen kernel — op-for-op IEEE mirror of the
    * clipTrapTerm SQL template, left-associated fold.
    */
  def compute(arr: ArrayData, rx0v: Long, rx1v: Long,
              ry0v: Long, ry1v: Long): Double = {
    val ry0d = ry0v.toDouble; val ry1d = ry1v.toDouble
    val dry = (ry1v - ry0v).toDouble
    val n = arr.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val r = arr.getStruct(i, 4)
      val x1 = r.getLong(0); val y1 = r.getLong(1)
      val x2 = r.getLong(2); val y2 = r.getLong(3)
      val lo = math.max(rx0v, math.min(x1, x2))
      val hi = math.min(rx1v, math.max(x1, x2))
      val term: Double =
        if (x1 == x2) 0.0
        else if (lo >= hi) 0.0
        else if (y1 == y2)
          (if (x2 > x1) hi - lo else lo - hi).toDouble *
            math.max(0L, math.min(y1, ry1v) - ry0v).toDouble
        else {
          val m = (y2 - y1).toDouble / (x2 - x1).toDouble
          val xa = if (x2 > x1) lo else hi
          val xb = if (x2 > x1) hi else lo
          def yAt(x: Long): Double = y1.toDouble + m * (x - x1).toDouble
          def bigF(u: Double): Double = {
            val v = math.min(math.max(u, ry0d), ry1d)
            (v - ry0d) * (v - ry0d) * 0.5 + dry * math.max(0.0, u - ry1d)
          }
          (bigF(yAt(xb)) - bigF(yAt(xa))) / m
        }
      acc = acc + term
      i += 1
    }
    acc
  }

  def apply(edges: Column, rx0: Column, rx1: Column, ry0: Column, ry1: Column): Column =
    GraftColumnBridge.column(new ClipTrapFold(
      GraftColumnBridge.expression(edges), GraftColumnBridge.expression(rx0),
      GraftColumnBridge.expression(rx1), GraftColumnBridge.expression(ry0),
      GraftColumnBridge.expression(ry1)))
}
