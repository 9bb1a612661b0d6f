package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused comma-joined decimal renderings of BIGINTs — the codegen
  * replacements for osm_duplicate_ways' signature builds, which ran as
  * interpreted transform(.., CAST(x AS STRING)) lambdas + array_join
  * (allocating one UTF8String per element per row). Exact semantics of
  * the pair they replace: CAST(bigint AS STRING) is the plain decimal
  * rendering = Long.toString, and array_join SKIPS null entries (a null
  * element, or a null field making the CAST null, contributes nothing —
  * not even a separator), mirrored here so nullable producers keep the
  * lambda's byte-identical output.
  *
  * [[StructLongCsv]]: array<struct<_, ref:bigint>> → "r1,r2,..." over
  * field 1 in array order (the caller array_sorts first).
  * [[LongsCsv]]: array<bigint> → same over the elements.
  */
case class StructLongCsv(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _) if st.length == 2 &&
      st(1).dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<_,bigint>>, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "struct_long_csv"

  override def nullSafeEval(v: Any): Any =
    CsvJoins.structCsv(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.CsvJoins.structCsv($a);")

  override protected def withNewChildInternal(newChild: Expression): StructLongCsv =
    copy(child = newChild)
}

case class LongsCsv(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "longs_csv"

  override def nullSafeEval(v: Any): Any =
    CsvJoins.longsCsv(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.CsvJoins.longsCsv($a);")

  override protected def withNewChildInternal(newChild: Expression): LongsCsv =
    copy(child = newChild)
}

object CsvJoins {
  def structCsv(a: ArrayData): UTF8String = {
    val n = a.numElements()
    val sb = new java.lang.StringBuilder(n * 7)
    var first = true
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val r = a.getStruct(i, 2)
        if (!r.isNullAt(1)) { // null CAST output is skipped by array_join
          if (!first) sb.append(',')
          sb.append(r.getLong(1))
          first = false
        }
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def longsCsv(a: ArrayData): UTF8String = {
    val n = a.numElements()
    val sb = new java.lang.StringBuilder(n * 7)
    var first = true
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        if (!first) sb.append(',')
        sb.append(a.getLong(i))
        first = false
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def structCsv(arr: Column): Column =
    GraftColumnBridge.column(StructLongCsv(GraftColumnBridge.expression(arr)))
  def longsCsv(arr: Column): Column =
    GraftColumnBridge.column(LongsCsv(GraftColumnBridge.expression(arr)))
}
