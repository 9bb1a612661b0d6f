package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.LongType
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter membership probe over a long (hashed-gram)
  * column — the scan-side kill for `text_bloom_contamination`
  * (`operators/TrainingOps.scala`), replacing the per-row Scala UDF the
  * r15 verdict flagged (item 5: "UDF where an expression fits" was the
  * one non-codegen probe left in a repo that fuses everything else).
  *
  * The filter travels as its SERIALIZED bytes inside the expression tree
  * (plan-attached, shipped once per stage with the task binary — the
  * same transport class as a broadcast at this ~1.2 MB size) and is
  * deserialized at most once per executor via the transient lazy val;
  * generated code probes through a reference to this expression
  * instance, so the whole-stage-codegen span over the gram scan stays
  * unbroken. Bloom guarantee unchanged: no false negatives, and false
  * positives are killed by the exact semi-join behind the probe.
  */
case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
  extends UnaryExpression with Predicate {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint column (xxhash64 gram), got ${other.simpleString}")
  }
  override def prettyName: String = "bloom_might_contain_long"

  /** Called from generated code — must stay public. */
  def mightContain(v: Long): Boolean = bloom.mightContainLong(v)

  override def nullSafeEval(v: Any): Any = bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomMightContainLong].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContain($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContainLong {
  def apply(v: Column, bloom: BloomFilter): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    GraftColumnBridge.column(
      BloomMightContainLong(GraftColumnBridge.expression(v), bos.toByteArray))
  }
}
