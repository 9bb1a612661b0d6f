package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-way routing-edge extraction of `osm_road_graph`, fused: sort the
  * collected points by (pos, node_ref), cut at the first point, the last
  * point, and every interior junction, and emit one edge struct per
  * consecutive cut pair with the exact per-edge polyline length fold —
  * `Σ sqrt(Δlon² + Δlat²)` in ascending index order, each delta an exact
  * integer difference, so the IEEE dataflow is operation-for-operation
  * the template chain it replaces (sort ≡ array_sort on the struct —
  * pos+node_ref determine the remaining fields; cuts ≡ filter(sequence);
  * pairs ≡ zip_with(slice, slice); fold ≡ aggregate over the same
  * zip_with) and the doubles are bit-equal. The meter factor and
  * final-only round stay OUTSIDE, at the call site, next to the oracle's.
  *
  * Why native: the template runs four interpreted higher-order lambdas
  * per way (none enter codegen) and allocates two slices per edge;
  * this is one pass over the point array. RoadGraphSpec's sparse fixture
  * pins interior-run splitting, edge chaining, and length additivity on
  * both formulations' shared output.
  *
  * Input: array<struct<pos:int, node_ref:long, lon_c:long, lat_c:long,
  * is_junc:boolean>> (unsorted — sorting happens here).
  * Output: array<struct<from_node:long, to_node:long, n_pts:long,
  * len_raw:double>> in edge order (posexplode index = edge_seq - 1).
  */
case class RoadEdges(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _) if st.length == 5 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<pos,node_ref,lon_c,lat_c,is_junc>>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("from_node", LongType, nullable = false),
    StructField("to_node", LongType, nullable = false),
    StructField("n_pts", LongType, nullable = false),
    StructField("len_raw", DoubleType, nullable = false))), containsNull = false)

  override def prettyName: String = "road_edges"

  override def nullSafeEval(input: Any): Any =
    RoadEdges.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, p =>
      s"${ev.value} = graft.functions.RoadEdges.compute($p);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RoadEdges {
  def apply(pts: Column): Column =
    GraftColumnBridge.column(RoadEdges(GraftColumnBridge.expression(pts)))

  def compute(pts: ArrayData): ArrayData = {
    val n = pts.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // materialize columns once (getStruct rows may share a buffer)
    val pos = new Array[Int](n)
    val ref = new Array[Long](n)
    val lon = new Array[Long](n)
    val lat = new Array[Long](n)
    val jun = new Array[Boolean](n)
    val idx = new Array[Integer](n)
    var i = 0
    while (i < n) {
      val r = pts.getStruct(i, 5)
      pos(i) = r.getInt(0)
      ref(i) = r.getLong(1)
      lon(i) = r.getLong(2)
      lat(i) = r.getLong(3)
      jun(i) = r.getBoolean(4)
      idx(i) = i
      i += 1
    }
    java.util.Arrays.sort(idx, (a: Integer, b: Integer) => {
      val c = java.lang.Integer.compare(pos(a), pos(b))
      if (c != 0) c else java.lang.Long.compare(ref(a), ref(b))
    })
    // cut positions in sorted order: first, last, interior junctions
    val cuts = new Array[Int](n)
    var nc = 0
    i = 0
    while (i < n) {
      if (i == 0 || i == n - 1 || jun(idx(i))) { cuts(nc) = i; nc += 1 }
      i += 1
    }
    val edges = new Array[Any](math.max(nc - 1, 0))
    var e = 0
    while (e < nc - 1) {
      val c0 = cuts(e)
      val c1 = cuts(e + 1)
      var len = 0.0
      var k = c0 + 1
      while (k <= c1) {
        val dx = lon(idx(k)) - lon(idx(k - 1))
        val dy = lat(idx(k)) - lat(idx(k - 1))
        len += math.sqrt((dx * dx + dy * dy).toDouble)
        k += 1
      }
      edges(e) = new GenericInternalRow(Array[Any](
        ref(idx(c0)), ref(idx(c1)), (c1 - c0 + 1).toLong, len))
      e += 1
    }
    new GenericArrayData(edges)
  }
}
