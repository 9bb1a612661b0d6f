package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused per-way geometry-QA stats over the SORTED point array
  * `array<struct<pos, node_ref:bigint, lon_c:bigint, lat_c:bigint>>` —
  * the codegen replacement for osm_geometry_qa's two transform() +
  * one filter() lambdas and two array_distinct passes (each interpreted
  * per element). One walk computes, with the EXACT integer semantics of
  * the expressions it replaces:
  *
  *  - n_pts          = size(a)
  *  - n_zero_len     = #{i : pk[i] = pk[i+1]} over consecutive pairs,
  *                     pk = lon_c·100000000 + lat_c (injective by the
  *                     fixture's lat bound), 0 when n < 2
  *  - is_ring        = n ≥ 2 ∧ refs[0] = refs[n−1]
  *  - n_illegal_reps = n − |distinct refs| − (is_ring ? 1 : 0)
  *  - n_distinct_pts = |distinct pk|
  *
  * All counts are set-cardinality/equality logic on exact BIGINTs, so
  * equivalence is algebraic, not order- or IEEE-dependent.
  * containsNull=true arrays are rejected (same null-hygiene rule as the
  * other fused kernels — ADVICE r19).
  */
case class GeomQaStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, false) if st.length == 4 &&
      st(1).dataType == LongType &&
      st(2).dataType == LongType && st(3).dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<_,node_ref:bigint,lon_c:bigint,lat_c:bigint>> " +
        s"with non-null elements, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_pts", LongType, nullable = false),
    StructField("n_zero_len", LongType, nullable = false),
    StructField("is_ring", BooleanType, nullable = false),
    StructField("n_illegal_repeats", LongType, nullable = false),
    StructField("n_distinct_pts", LongType, nullable = false)))
  override def prettyName: String = "geom_qa_stats"

  override def nullSafeEval(v: Any): Any =
    GeomQaStats.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.GeomQaStats.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): GeomQaStats =
    copy(child = newChild)
}

object GeomQaStats {
  def compute(a: ArrayData): GenericInternalRow = {
    val n = a.numElements()
    val refs = new java.util.HashSet[java.lang.Long]()
    val pks = new java.util.HashSet[java.lang.Long]()
    var zero = 0L
    var firstRef = 0L; var lastRef = 0L
    var prevPk = 0L
    var i = 0
    while (i < n) {
      val r = a.getStruct(i, 4)
      val ref = r.getLong(1)
      val pk = r.getLong(2) * 100000000L + r.getLong(3)
      if (i == 0) firstRef = ref
      lastRef = ref
      if (i > 0 && pk == prevPk) zero += 1L
      refs.add(ref); pks.add(pk)
      prevPk = pk
      i += 1
    }
    val isRing = n >= 2 && firstRef == lastRef
    val illegal = n.toLong - refs.size.toLong - (if (isRing) 1L else 0L)
    new GenericInternalRow(Array[Any](
      n.toLong, zero, isRing, illegal, pks.size.toLong))
  }

  def apply(pts: Column): Column =
    GraftColumnBridge.column(new GeomQaStats(GraftColumnBridge.expression(pts)))
}
