package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused street-grid orientation bin counts over one way's SORTED point
  * array — the codegen replacement for osm_way_bearing's aggregate()
  * lambda (higher-order lambdas never enter whole-stage codegen; the
  * emb_random_projection fusion measured the interpreted floor at ~8×).
  *
  * Input: array<struct<pos, node_ref, lon_c: bigint, lat_c: bigint>>,
  * already array_sort'ed by the caller (same element the lambda saw).
  * Output: struct<ew,ns,ne,nw bigint> — per-segment classification on
  * exact BIGINTs, identical to the in-fold rule it replaces:
  * zero-length segments skipped; 12·|dy| < 5·|dx| → E-W;
  * 5·|dy| > 12·|dx| → N-S; else dx·dy > 0 → NE-SW else NW-SE.
  */
case class BearingBins(child: Expression) extends UnaryExpression {

  // containsNull=true rejected (ADVICE r19) — see RingShoe: the loop's
  // getStruct().getLong() would NPE on a null element instead of the
  // lambda's null-propagation; producers here are containsNull=false.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, false) if st.length == 4 &&
      st(2).dataType == LongType && st(3).dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<_,_,lon_c:bigint,lat_c:bigint>> " +
        s"with non-null elements, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("ew", LongType, nullable = false),
    StructField("ns", LongType, nullable = false),
    StructField("ne", LongType, nullable = false),
    StructField("nw", LongType, nullable = false)))
  override def prettyName: String = "bearing_bins"

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var ew = 0L; var ns = 0L; var ne = 0L; var nw = 0L
    var i = 1
    var px = if (n > 0) a.getStruct(0, 4).getLong(2) else 0L
    var py = if (n > 0) a.getStruct(0, 4).getLong(3) else 0L
    while (i < n) {
      val r = a.getStruct(i, 4)
      val x = r.getLong(2); val y = r.getLong(3)
      val dx = x - px; val dy = y - py
      if (!(dx == 0L && dy == 0L)) {
        val adx = math.abs(dx); val ady = math.abs(dy)
        if (12L * ady < 5L * adx) ew += 1L
        else if (5L * ady > 12L * adx) ns += 1L
        else if (dx * dy > 0L) ne += 1L
        else nw += 1L
      }
      px = x; py = y
      i += 1
    }
    new GenericInternalRow(Array[Any](ew, ns, ne, nw))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val ew = ctx.freshName("ew"); val ns = ctx.freshName("ns")
      val ne = ctx.freshName("ne"); val nw = ctx.freshName("nw")
      val px = ctx.freshName("px"); val py = ctx.freshName("py")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val dx = ctx.freshName("dx"); val dy = ctx.freshName("dy")
      val adx = ctx.freshName("adx"); val ady = ctx.freshName("ady")
      val r = ctx.freshName("r")
      val gir = classOf[GenericInternalRow].getName
      s"""
         |int $n = $a.numElements();
         |long $ew = 0L, $ns = 0L, $ne = 0L, $nw = 0L;
         |long $px = $n > 0 ? $a.getStruct(0, 4).getLong(2) : 0L;
         |long $py = $n > 0 ? $a.getStruct(0, 4).getLong(3) : 0L;
         |for (int $i = 1; $i < $n; $i++) {
         |  InternalRow $r = $a.getStruct($i, 4);
         |  long $x = $r.getLong(2); long $y = $r.getLong(3);
         |  long $dx = $x - $px; long $dy = $y - $py;
         |  if (!($dx == 0L && $dy == 0L)) {
         |    long $adx = java.lang.Math.abs($dx); long $ady = java.lang.Math.abs($dy);
         |    if (12L * $ady < 5L * $adx) $ew++;
         |    else if (5L * $ady > 12L * $adx) $ns++;
         |    else if ($dx * $dy > 0L) $ne++;
         |    else $nw++;
         |  }
         |  $px = $x; $py = $y;
         |}
         |${ev.value} = new $gir(new Object[]{
         |  java.lang.Long.valueOf($ew), java.lang.Long.valueOf($ns),
         |  java.lang.Long.valueOf($ne), java.lang.Long.valueOf($nw)});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BearingBins =
    copy(child = newChild)
}

object BearingBins {
  def apply(pts: Column): Column =
    GraftColumnBridge.column(new BearingBins(GraftColumnBridge.expression(pts)))
}
