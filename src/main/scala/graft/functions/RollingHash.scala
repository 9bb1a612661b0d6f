package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of (up to the first `maxChars` code points of)
  * a string: fold acc ← (acc·131 + codepoint) mod 1e9+7 — the
  * cross-engine-exact content fingerprint used by `text_fingerprint`,
  * `sample_stratified` and `sample_temperature` (both engines' `ascii`
  * return the first CODE POINT, probed on 'é'/'中'; the modulus keeps the
  * fold in 63-bit range where both are exact).
  *
  * Why a native expression: the equivalent
  * `aggregate(transform(sequence(1, length(s)), i → ascii(substring(s,i,1))), …)`
  * allocates an index array + a substring per character and dispatches two
  * lambdas per element — and deeply nested higher-order lambdas fall out
  * of whole-stage codegen entirely (SCALE.md measured hazard). This is
  * one fused primitive loop over the decoded code points (measured ~25×
  * on the sampling queries). Same extension class as [[CosineSimilarity]].
  */
case class RollingHash(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int maxChars), got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(s: Any, n: Any): Any =
    RollingHash.hash(s.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, n) =>
      s"${ev.value} = graft.functions.RollingHash.hash($s, $n);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object RollingHash {
  /** Full-string fingerprint. */
  def apply(c: Column): Column = apply(c, Int.MaxValue)

  def apply(c: Column, maxChars: Int): Column =
    GraftColumnBridge.column(RollingHash(
      GraftColumnBridge.expression(c),
      org.apache.spark.sql.catalyst.expressions.Literal(maxChars)))

  def hash(s: UTF8String, maxChars: Int): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    var count = 0
    while (i < str.length && count < maxChars) {
      val cp = str.codePointAt(i)
      acc = (acc * 131L + cp) % 1000000007L
      i += Character.charCount(cp)
      count += 1
    }
    acc
  }
}
