package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Codegen'd 1-D interval overlap `[aLo,aHi] ∩ [bLo,bHi] ≠ ∅` over integer
  * micro-unit bounds — the scalar core of PostGIS's bbox operator `&&`
  * (the reference's spatial-join workload, `/root/reference/README.md:80-82`;
  * a 2-D box test is two of these ANDed).
  *
  * Why an `Expression` and not four column comparisons: as a nested-loop
  * join condition this predicate runs once per PROBE×BUILD pair — the
  * hottest loop a theta join has. One fused node emits a single branchless
  * comparison pair with no intermediate BooleanType columns, stays inside
  * whole-stage codegen, and gives the plan an explicit, assertable name
  * (`interval_overlaps`, pinned by PlanSpec) instead of an anonymous
  * arithmetic soup. Bounds are LongType micro-units by design: exact in
  * both engines (oracle-safe) and the same integer-centi-degree convention
  * the OSM geometry kernels use.
  */
case class IntervalOverlaps(first: Expression, second: Expression,
                            third: Expression, fourth: Expression)
  extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires four bigint micro-unit bounds, got " +
        children.map(_.dataType.simpleString).mkString("(", ", ", ")"))
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "interval_overlaps"

  override def nullSafeEval(aLo: Any, aHi: Any, bLo: Any, bHi: Any): Any =
    aLo.asInstanceOf[Long] <= bHi.asInstanceOf[Long] &&
      bLo.asInstanceOf[Long] <= aHi.asInstanceOf[Long]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (aLo, aHi, bLo, bHi) =>
      s"${ev.value} = $aLo <= $bHi && $bLo <= $aHi;")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

object IntervalOverlaps {
  def apply(aLo: Column, aHi: Column, bLo: Column, bHi: Column): Column =
    GraftColumnBridge.column(IntervalOverlaps(
      GraftColumnBridge.expression(aLo), GraftColumnBridge.expression(aHi),
      GraftColumnBridge.expression(bLo), GraftColumnBridge.expression(bHi)))
}
