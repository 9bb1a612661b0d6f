package graft

import org.apache.spark.sql.functions._

/** End-to-end pipeline golden test (SURVEY.md §5.5): the Airflow-invokable
  * job unit writes a partitioned lake; re-reads must prune partitions and
  * reconcile with direct computation.
  */
class OsmEtlJobSpec extends GraftSuite {

  test("OsmEtlJob writes a partition-pruned, reconcilable lake") {
    val out = java.nio.file.Files.createTempDirectory("graft_etl").toString
    // run the stages in-process (main would spawn its own session)
    val refs = T.lineitem(spark, sf).select(
      col("l_orderkey").as("way_id"), col("l_linenumber").as("pos"),
      col("l_partkey").as("node_ref"))
    val nodes = T.part(spark, sf).select(
      col("p_partkey").as("node_id"),
      (col("p_size").cast("long") * 100).as("lon_c"),
      round(col("p_retailprice") * 100).cast("long").as("lat_c"),
      col("p_brand"), col("p_type"))
    val ways = plans.OsmEtlJob.assembleWays(refs, nodes)
    // every order with lineitems becomes a way; point count reconciles
    assert(ways.count() == T.lineitem(spark, sf).select("l_orderkey").distinct().count())
    assert(ways.agg(sum(col("n_points"))).head.getLong(0) == T.lineitem(spark, sf).count())
    // bbox containment: every way bbox sits inside the global node bbox
    val g = nodes.agg(min("lon_c"), min("lat_c"), max("lon_c"), max("lat_c")).head
    val bad = ways.where(col("bbox.minx") < g.getLong(0) || col("bbox.miny") < g.getLong(1) ||
                         col("bbox.maxx") > g.getLong(2) || col("bbox.maxy") > g.getLong(3))
    assert(bad.count() == 0)
    // layer routing: multi-membership allowed, rule-consistent
    val layers = plans.OsmEtlJob.extractLayers(
      nodes, Seq("heavy" -> (col("lon_c") >= 2500), "premium" -> (col("lat_c") > 150000)))
    assert(layers.where(col("layer") === "heavy" && col("lon_c") < 2500).count() == 0)
    assert(layers.where(col("layer") === "premium" && col("lat_c") <= 150000).count() == 0)
    // area assembly: one polygon per way, closed CCW shell, area matches
    // the exact shoelace of the decoded bytes
    val areas = plans.OsmEtlJob.assembleAreas(ways)
    assert(areas.count() == ways.count())
    areas.orderBy("way_id").limit(100).collect().foreach { r =>
      val rings = graft.functions.WkbPolygon.decode(r.getAs[Array[Byte]]("polygon_wkb"))
      assert(rings.size == 1)
      val (lons, lats) = rings.head
      assert(lons.head == lons.last && lats.head == lats.last)
      val shoe = graft.functions.WkbPolygon.shoelace(
        lons.map(x => math.round(x * 100)), lats.map(x => math.round(x * 100)))
      assert(shoe >= 0, "shell must be CCW-normalized")
      assert(math.abs(r.getAs[Double]("area") - math.abs(shoe) / 20000.0) < 1e-9)
    }
    // partitioned write + pruned re-read
    ways.join(
        T.orders(spark, sf).select(col("o_orderkey").as("way_id"),
                                   (col("o_orderkey") % 3).cast("string").as("region")), "way_id")
      .write.mode("overwrite").partitionBy("region").parquet(s"$out/ways")
    val pruned = spark.read.parquet(s"$out/ways").where(col("region") === "0")
    val scan = pruned.queryExecution.executedPlan.toString()
    assert(scan.contains("PartitionFilters") && scan.contains("region"),
           "re-read must prune on the partition column")
    assert(pruned.count() > 0)
  }

  test("assembleWays node-store broadcast is size-gated: degrades to a shuffle join") {
    // The node store is the corpus (a planet-scale node location store);
    // the resolve join must not hard-broadcast it. Mirror of PlanSpec's
    // gate-degradation test, aimed at the actual spark-submit job path.
    val refs = T.lineitem(spark, sf).select(
      col("l_orderkey").as("way_id"), col("l_linenumber").as("pos"),
      col("l_partkey").as("node_ref"))
    val nodes = T.part(spark, sf).select(
      col("p_partkey").as("node_id"),
      (col("p_size").cast("long") * 100).as("lon_c"),
      round(col("p_retailprice") * 100).cast("long").as("lat_c"))
    val under = plans.OsmEtlJob.assembleWays(refs, nodes)
    assert(under.queryExecution.executedPlan.toString().contains("BroadcastHashJoin"),
           "under the budget the node resolve must broadcast")
    spark.conf.set("spark.sql.graft.broadcastGateBytes", "1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val over = plans.OsmEtlJob.assembleWays(refs, nodes)
      assert(!over.queryExecution.executedPlan.toString().contains("BroadcastHashJoin"),
             "above the budget the node resolve must shuffle, not broadcast")
      assert(over.count() === under.count(), "gate must never change results")
    } finally {
      spark.conf.unset("spark.sql.graft.broadcastGateBytes")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("regionOfWay customer broadcast is size-gated: degrades to a shuffle join") {
    // customer grows linearly with sf (unlike nation/region, constant at
    // 25/5 rows) — same hazard class as the node store, same gate.
    val (o, c, n, r) = (T.orders(spark, sf), T.customer(spark, sf),
                        T.nation(spark, sf), T.region(spark, sf))
    val under = plans.OsmEtlJob.regionOfWay(o, c, n, r)
    val underPlan = under.queryExecution.executedPlan.toString()
    assert(underPlan.contains("BroadcastHashJoin") &&
           !underPlan.contains("SortMergeJoin") && !underPlan.contains("ShuffledHashJoin"),
           "under the budget all three dim joins must broadcast")
    spark.conf.set("spark.sql.graft.broadcastGateBytes", "1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val over = plans.OsmEtlJob.regionOfWay(o, c, n, r)
      val overPlan = over.queryExecution.executedPlan.toString()
      assert(overPlan.contains("SortMergeJoin") || overPlan.contains("ShuffledHashJoin"),
             "above the budget the customer join must shuffle, not broadcast")
      assert(over.count() === under.count(), "gate must never change results")
    } finally {
      spark.conf.unset("spark.sql.graft.broadcastGateBytes")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("full pipeline: OsmEtlJob lake -> PostgisLoadJob round-trips WKB byte-exact") {
    // The reference pipeline end-to-end (`osm_etl.py:57-91`): ETL assembles
    // the lake, the terminal load ships it to the serving database. Derby
    // stands in for PostGIS; the load path (relational flattening, DDL
    // pins, overwrite semantics) is identical.
    val out = java.nio.file.Files.createTempDirectory("graft_e2e").toString
    val counts = plans.OsmEtlJob.run(spark, sf, out, "2024-07-25").toMap
    assert(counts.keySet === Set("ways", "relations", "areas", "layers"))
    assert(counts.values.forall(_ > 0), s"empty lake table: $counts")
    val url = operators.JdbcIO.freshEmbeddedDerby("graft_e2e_load")
    val loaded = plans.PostgisLoadJob.load(spark, out, url).toMap
    assert(loaded === counts, "load must report exactly the lake's row counts")
    // idempotency: a retried load (the DAG's retries=2) must not duplicate
    val again = plans.PostgisLoadJob.load(spark, out, url).toMap
    assert(again === counts)
    assert(operators.JdbcIO.readTable(spark, url, "osm_areas").count() === counts("areas"))
    // geometry survives the hand-off byte-exact: every polygon WKB read
    // back from the database equals the lake's bytes (ST_GeomFromWKB
    // server-side then sees the identical geometry)
    val lakeWkb = spark.read.parquet(s"$out/areas")
      .select(col("way_id"), col("polygon_wkb"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("polygon_wkb")).toMap
    val dbWkb = operators.JdbcIO.readTable(spark, url, "osm_areas")
      .select(col("way_id"), col("polygon_wkb"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("polygon_wkb")).toMap
    assert(dbWkb.keySet === lakeWkb.keySet)
    for ((id, bytes) <- lakeWkb)
      assert(java.util.Arrays.equals(bytes, dbWkb(id)), s"WKB differs for way $id")
  }
}
