package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Fused Johnson–Lindenstrauss ±1 sign projection d → nOut, as ONE
  * codegen'd scalar expression over the raw float vector — the "next
  * rung" the emb_random_projection call site documented: the previous
  * formulation (transform + 16 nested aggregate() folds over a
  * quantized copy) is a higher-order lambda, which never enters
  * whole-stage codegen (SCALE.md r14) and measured 1.39 s at sf0.1
  * as the interpreted floor.
  *
  * Bit-identical contract with the lambda it replaces (and the DuckDB
  * oracle, which recomputes the sign MIX itself):
  *  - q_i = floor(double(x_i) · 1e6 + 0.5) as BIGINT — the same IEEE
  *    double ops in the same order;
  *  - y_j = Σ_i s(i,j)·q_i over exact BIGINTs, i = 1-based input dim;
  *    s(i,j) = +1 iff bit (i−1)%64 of maskWords(j·2 + (i−1)/64) is set
  *    (mask words are the Scala-computed splice the call site builds);
  *  - a NULL element poisons every output slot to NULL (the lambda's
  *    acc + NULL semantics), and the array stays 16-long so the
  *    posexplode row count is unchanged;
  *  - an embedding wider than 64·(maskWords/nOut) dims fails LOUD with
  *    the call site's message (the decodeWav contract).
  */
case class JlSignProject(child: Expression, maskWords: Seq[Long], nOut: Int)
  extends UnaryExpression {

  require(nOut >= 1 && maskWords.length % nOut == 0,
    s"maskWords length ${maskWords.length} must be a multiple of nOut=$nOut")

  private val wordsPerOut = maskWords.length / nOut
  private val maxDims = 64 * wordsPerOut

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "jl_sign_project"

  @transient private lazy val masksArr: Array[Long] = maskWords.toArray

  private def tooWide(): Nothing = throw new IllegalStateException(
    "emb_random_projection: embedding wider than the 128-dim sign-mask table")

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n > maxDims) tooWide()
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { hasNull = x.isNullAt(i); i += 1 }
    if (hasNull) {
      new GenericArrayData(Array.fill[Any](nOut)(null))
    } else {
      val q = new Array[Long](n)
      i = 0
      while (i < n) {
        q(i) = math.floor(x.getFloat(i).toDouble * 1000000.0 + 0.5).toLong
        i += 1
      }
      val y = new Array[Long](nOut)
      var j = 0
      while (j < nOut) {
        var acc = 0L
        i = 0
        while (i < n) {
          val m = masksArr(j * wordsPerOut + (i >> 6))
          acc += (if (((m >>> (i & 63)) & 1L) == 1L) q(i) else -q(i))
          i += 1
        }
        y(j) = acc
        j += 1
      }
      new GenericArrayData(y.map(Long.box(_): Any))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val masksRef = ctx.addReferenceObj("jlMasks", masksArr, "long[]")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val q = ctx.freshName("q")
      val acc = ctx.freshName("acc"); val out = ctx.freshName("out")
      val hasNull = ctx.freshName("hasNull")
      val m = ctx.freshName("m") // ADVICE r19: codegen hygiene, no fixed ids
      val gad = classOf[GenericArrayData].getName
      val self = classOf[JlSignProject].getName
      s"""
         |int $n = $x.numElements();
         |if ($n > $maxDims) $self.tooWideStatic();
         |boolean $hasNull = false;
         |for (int $i = 0; $i < $n && !$hasNull; $i++) $hasNull = $x.isNullAt($i);
         |Object[] $out = new Object[$nOut];
         |if (!$hasNull) {
         |  long[] $q = new long[$n];
         |  for (int $i = 0; $i < $n; $i++)
         |    $q[$i] = (long) java.lang.Math.floor((double) $x.getFloat($i) * 1000000.0D + 0.5D);
         |  for (int $j = 0; $j < $nOut; $j++) {
         |    long $acc = 0L;
         |    for (int $i = 0; $i < $n; $i++) {
         |      long $m = $masksRef[$j * $wordsPerOut + ($i >> 6)];
         |      $acc += ((($m >>> ($i & 63)) & 1L) == 1L) ? $q[$i] : -$q[$i];
         |    }
         |    $out[$j] = java.lang.Long.valueOf($acc);
         |  }
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): JlSignProject =
    copy(child = newChild)
}

object JlSignProject {
  /** Codegen entry point for the loud width guard. */
  def tooWideStatic(): Unit = throw new IllegalStateException(
    "emb_random_projection: embedding wider than the 128-dim sign-mask table")

  def apply(col: Column, maskWords: Seq[Long], nOut: Int): Column =
    GraftColumnBridge.column(new JlSignProject(
      GraftColumnBridge.expression(col), maskWords, nOut))
}
