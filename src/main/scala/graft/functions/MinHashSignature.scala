package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature of a hashed-gram set, as ONE fused codegen'd scalar
  * expression: `array<bigint>` of `k` minima, slot `i` = min over grams of
  * `XXH64.hashLong(gram, seed = i)`.
  *
  * This replaces the previous formulation of the signature as k separate
  * `min(xxhash64(g, i))` AGGREGATE columns over exploded gram rows
  * (reference semantics: osm2pgsql-adjacent corpus dedup is not in
  * `/root/reference`; this is the BASELINE.json north_star dedup surface).
  * Measured at sf0.1, the k=60-column aggregate compiled a janino class at
  * the documented size cliff and dominated the whole bench (22.9s).
  * The signature is per-document state — each doc's distinct gram hashes
  * already sit in one array cell — so it needs no explode, no partial
  * aggregate, and NO SHUFFLE: one map-side O(#grams × k) primitive loop
  * per row. That shape is invariant under scale-out: at 100 TB it stays
  * embarrassingly parallel, while the aggregate version shuffled a
  * 60-long row per document.
  *
  * The per-slot family `h_i(g) = xxh64(g, seed=i)` is a standard
  * independent-seed xxhash family; any such family satisfies the LSH
  * collision analysis documented at the call site (LlmOps.dedup_minhash).
  */
case class MinHashSignature(child: Expression, k: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> gram hashes, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val grams = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    val n = grams.numElements()
    var j = 0
    while (j < n) {
      val g = grams.getLong(j)
      var i = 0
      while (i < k) {
        val h = XXH64.hashLong(g, i.toLong)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, g => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val mins = ctx.freshName("mins")
      val v = ctx.freshName("v")
      val h = ctx.freshName("h")
      val xxh = classOf[XXH64].getName
      val uad = classOf[UnsafeArrayData].getName
      s"""
         |int $n = $g.numElements();
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  long $v = $g.getLong($j);
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $h = $xxh.hashLong($v, (long) $i);
         |    if ($h < $mins[$i]) $mins[$i] = $h;
         |  }
         |}
         |${ev.value} = $uad.fromPrimitiveArray($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  def apply(gramHashes: Column, k: Int): Column =
    GraftColumnBridge.column(
      MinHashSignature(GraftColumnBridge.expression(gramHashes), k))
}

/** Slot-wise agreement count of two equal-length MinHash signatures:
  * `|{i : a[i] == b[i]}|`. Matching slots / k is the standard unbiased
  * estimator of Jaccard similarity — the LSH candidate prefilter.
  *
  * Replaces an `array_intersect` over per-slot `(i, m)` STRUCT arrays:
  * that formulation allocated 60 structs per row and hashed struct keys
  * per candidate pair; this is one primitive loop per pair with zero
  * allocation, evaluated once per LSH candidate (the hot row count of the
  * whole dedup at scale).
  */
case class SignatureAgreement(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> signatures, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "sig_agreement"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) { if (x.getLong(i) == y.getLong(i)) c += 1; i += 1 }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.getLong($i) == $y.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SignatureAgreement {
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      SignatureAgreement(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
