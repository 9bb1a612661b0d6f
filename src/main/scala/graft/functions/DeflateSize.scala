package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object DeflateCore {
  /** DEFLATE-compressed byte count of a string's UTF-8 bytes at the
    * fixed level 6 / default strategy — the compressibility statistic
    * behind the Gopher-style "too compressible = repetitive spam"
    * quality screen. Level, strategy, and the (JDK-bundled) zlib are
    * pinned, so the count is deterministic across executors, re-runs,
    * and partitionings; a fresh Deflater per call keeps it state-free
    * (no dictionary carry-over between rows).
    */
  def size(s: UTF8String): Int = {
    val in = s.getBytes
    val d = new java.util.zip.Deflater(6, false)
    d.setInput(in)
    d.finish()
    val buf = new Array[Byte](8192)
    var n = 0
    while (!d.finished()) n += d.deflate(buf)
    d.end()
    n
  }
}

/** Codegen'd wrapper over [[DeflateCore.size]] — one static call per row,
  * no boxing, no UDF registration. */
case class DeflateSize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_size"
  override def nullSafeEval(input: Any): Any =
    DeflateCore.size(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.DeflateCore.size($s)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateSize {
  def apply(text: Column): Column =
    GraftColumnBridge.column(DeflateSize(GraftColumnBridge.expression(text)))
}
