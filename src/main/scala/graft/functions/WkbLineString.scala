package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** OGC WKB (well-known binary) LineString encoder — the terminal geometry
  * representation of the reference stack: osm2pgsql/PostGIS store way
  * geometries as WKB geometry columns (`/root/reference/README.md:80-82`),
  * and SURVEY §1.2 maps geometry to "WKB as BinaryType + bbox struct".
  *
  * Layout (little-endian NDR): byte 0 = 0x01, uint32 type = 2
  * (LineString), uint32 n_points, then n × (float64 lon, float64 lat) —
  * 9 + 16·n bytes total, byte-compatible with `ST_GeomFromWKB`.
  *
  * A native Catalyst expression (same extension class as
  * [[CosineSimilarity]]): stays inside whole-stage codegen via one static
  * call — no UDF serialization, no interpreted fallback in the 100 TB
  * assembly path.
  */
case class WkbLineString(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments (lons, lats), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "wkb_linestring"

  override def nullSafeEval(a: Any, b: Any): Any =
    WkbLineString.encode(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lons, lats) =>
      s"${ev.value} = graft.functions.WkbLineString.encode($lons, $lats);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object WkbLineString {
  def apply(lons: Column, lats: Column): Column =
    GraftColumnBridge.column(
      WkbLineString(GraftColumnBridge.expression(lons), GraftColumnBridge.expression(lats)))

  /** Shared eval/codegen kernel (static call keeps codegen bodies tiny —
    * janino class-size is a measured hazard, SCALE.md). */
  def encode(lons: ArrayData, lats: ArrayData): Array[Byte] = {
    val n = math.min(lons.numElements(), lats.numElements())
    val buf = java.nio.ByteBuffer.allocate(9 + 16 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(1: Byte) // NDR
    buf.putInt(2)    // LineString
    buf.putInt(n)
    var i = 0
    while (i < n) {
      buf.putDouble(lons.getDouble(i))
      buf.putDouble(lats.getDouble(i))
      i += 1
    }
    buf.array()
  }

  /** Decode for round-trip verification (tests / consumers). */
  def decode(wkb: Array[Byte]): (Array[Double], Array[Double]) = {
    val buf = java.nio.ByteBuffer.wrap(wkb).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(buf.get() == 1, "expected little-endian NDR marker")
    require(buf.getInt() == 2, "expected LineString type 2")
    val n = buf.getInt()
    val lons = new Array[Double](n)
    val lats = new Array[Double](n)
    var i = 0
    while (i < n) { lons(i) = buf.getDouble(); lats(i) = buf.getDouble(); i += 1 }
    (lons, lats)
  }
}

/** OGC WKB MultiLineString encoder — the relation-level geometry artifact
  * ("relations get their geometry from member nodes and ways",
  * `/root/reference/README.md:80-81`): each member way contributes one
  * LineString; the relation is their WKB collection (type 5).
  *
  * Layout: NDR byte, uint32 type = 5, uint32 n_lines, then each member as
  * a complete embedded WKB LineString — 9 + Σ(9 + 16·nᵢ) bytes,
  * `ST_GeomFromWKB`-compatible.
  *
  * Input is the per-relation array of member point arrays (array of
  * array<double> per axis), produced by an ordered regroup — nesting
  * stays inside the row, so the operator is still one aggregation, no
  * extra shuffle over the way-level assembly.
  */
case class WkbMultiLineString(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<array<double>> arguments (lons, lats), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "wkb_multilinestring"

  override def nullSafeEval(a: Any, b: Any): Any =
    WkbMultiLineString.encode(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lons, lats) =>
      s"${ev.value} = graft.functions.WkbMultiLineString.encode($lons, $lats);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object WkbMultiLineString {
  def apply(lons: Column, lats: Column): Column =
    GraftColumnBridge.column(
      WkbMultiLineString(GraftColumnBridge.expression(lons), GraftColumnBridge.expression(lats)))

  def encode(lonss: ArrayData, latss: ArrayData): Array[Byte] = {
    val m = math.min(lonss.numElements(), latss.numElements())
    var bytes = 9
    var j = 0
    while (j < m) {
      bytes += 9 + 16 * math.min(
        lonss.getArray(j).numElements(), latss.getArray(j).numElements())
      j += 1
    }
    val buf = java.nio.ByteBuffer.allocate(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(1: Byte) // NDR
    buf.putInt(5)    // MultiLineString
    buf.putInt(m)
    j = 0
    while (j < m) {
      buf.put(WkbLineString.encode(lonss.getArray(j), latss.getArray(j)))
      j += 1
    }
    buf.array()
  }

  /** Decode for round-trip verification. */
  def decode(wkb: Array[Byte]): Seq[(Array[Double], Array[Double])] = {
    val buf = java.nio.ByteBuffer.wrap(wkb).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(buf.get() == 1, "expected little-endian NDR marker")
    require(buf.getInt() == 5, "expected MultiLineString type 5")
    val m = buf.getInt()
    (0 until m).map { _ =>
      require(buf.get() == 1 && buf.getInt() == 2, "expected embedded LineString")
      val n = buf.getInt()
      val lons = new Array[Double](n)
      val lats = new Array[Double](n)
      var i = 0
      while (i < n) { lons(i) = buf.getDouble(); lats(i) = buf.getDouble(); i += 1 }
      (lons, lats)
    }
  }
}
