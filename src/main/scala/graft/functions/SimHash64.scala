package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of a token array as ONE fused map-side expression:
  * bit b of the result is set iff Σ over token OCCURRENCES of
  * (bit b of hash(token) ? +1 : −1) is ≥ 0.
  *
  * Replaces 64 `sum(when(...))` aggregate columns over exploded token
  * rows — the same janino-class-size/shuffle shape the MinHash signature
  * escaped (see [[MinHashSignature]]): the signature is per-document
  * state over the doc's own tokens, so it needs no explode, no
  * aggregate, and no shuffle. Occurrence weighting (a token counts once
  * per appearance) is preserved exactly — the exploded-sum formulation
  * weighted by construction, and the weighting is measured essential on
  * this corpus (LlmOps `dedup_simhash` notes).
  *
  * Token hash (r19, the change that made `dedup_simhash` ORACLE-able):
  * `mix64(RollingHash.hash(t))` — the repo's cross-engine-exact
  * polynomial code-point fingerprint widened to 64 well-mixed bits by
  * the splitmix64 finalizer. Unlike the previous xxhash64 (Spark
  * -internal, not reproducible in DuckDB), every step is plain mod-2^64
  * integer algebra the oracle spells with UBIGINT/HUGEINT — so the full
  * signature, and therefore the hamming pair set, is DuckDB-checkable.
  * Poly collisions (~30-bit space) merely merge two tokens' votes — and
  * identically so in both engines. PropertySpec re-pins the fused kernel
  * ≡ the 64-agg-column formulation over the same hash.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks =>
      s"${ev.value} = graft.functions.SimHash64.compute($toks);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  def apply(tokens: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(tokens)))

  /** splitmix64 finalizer (Steele et al., "Fast Splittable Pseudorandom
    * Number Generators", OOPSLA 2014 — the public-domain mix function):
    * Long wrapping arithmetic ≡ the oracle's HUGEINT mod-2^64 algebra. */
  def mix64(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Shared eval/codegen kernel (static call keeps codegen bodies tiny). */
  def compute(tokens: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = mix64(RollingHash.hash(tokens.getUTF8String(i), Int.MaxValue))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) >= 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}
