package graft.plans

import graft.T
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The Airflow-invokable pipeline unit (SURVEY.md §3.2, §7.2 slice 6) —
  * one `spark-submit` of this main replaces one per-region container run of
  * the reference (`docker exec … pgosm_flex.py --region=<r> --subregion=<s>
  * --pgosm-date=<d>`, `/root/reference/osm_etl.py:17-18,71-72`).
  *
  * Stages (each a stage of the reference's delegated ETL, §3.2):
  *   scan → way assembly → relation assembly → layer extraction →
  *   snapshot-partitioned lake write.
  *
  * Orchestration stance (SURVEY.md §1.2): Airflow keeps the job-level DAG
  * (`run >> etl_us >> etl_eu >> dump`, osm_etl.py:93) and passes
  * (region, date) as CLI args; INSIDE the job, Spark's scheduler owns the
  * stage graph. The reference's per-region TaskGroup fan-out becomes
  * partition parallelism over one region-partitioned dataset.
  *
  * Usage: OsmEtlJob <sfDir> <outDir> [pgosmDate]
  */
object OsmEtlJob {

  /** Ordered member resolve + regroup (the osm_way_geometry kernel,
    * producing the assembled-way table rather than the oracle summary).
    *
    * The node store is the corpus of this pipeline (osm2pgsql's node
    * location store is its central scaling problem), so the resolve join
    * goes through the size-gated [[graft.Gate.bcast]]: broadcast while the
    * node table fits the budget, shuffle join (same result, one exchange)
    * beyond it — a planet-scale node store must never be driver-collected.
    */
  def assembleWays(refs: DataFrame, nodes: DataFrame): DataFrame =
    refs
      .join(graft.Gate.bcast(nodes), refs("node_ref") === nodes("node_id"))
      .groupBy(col("way_id"))
      .agg(expr("array_sort(collect_list(struct(pos, node_ref, lon_c, lat_c)))").as("pts"))
      .select(col("way_id"), col("pts"),
              size(col("pts")).as("n_points"),
              // the PostGIS-equivalent geometry artifact (SURVEY §1.2:
              // "WKB as BinaryType + bbox struct", README.md:80-82)
              graft.functions.WkbLineString(
                expr("transform(pts, p -> CAST(p.lon_c AS DOUBLE) / 100.0D)"),
                expr("transform(pts, p -> CAST(p.lat_c AS DOUBLE) / 100.0D)")).as("wkb"),
              struct(
                expr("array_min(transform(pts, p -> p.lon_c))").as("minx"),
                expr("array_min(transform(pts, p -> p.lat_c))").as("miny"),
                expr("array_max(transform(pts, p -> p.lon_c))").as("maxx"),
                expr("array_max(transform(pts, p -> p.lat_c))").as("maxy")).as("bbox"))

  /** Area assembly over assembled ways (round-4 surface: the majority of
    * PgOSM Flex layers are area-shaped — buildings/water/landuse,
    * README.md:80-82): ring closure, exact integer shoelace area +
    * winding, CCW-normalized OGC WKB Polygon. Same semantics as the
    * `osm_way_polygon_wkb` operator, producing the lake table rather
    * than the oracle summary — all transforms stay inside the row over
    * the already-assembled `pts`, no additional shuffle.
    */
  def assembleAreas(ways: DataFrame): DataFrame =
    ways
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
      .select(col("way_id"),
        (abs(col("shoe")).cast("double") / 20000.0).as("area"),
        graft.functions.WkbPolygon(
          expr("array(transform(shell, p -> CAST(p.lon_c AS DOUBLE) / 100.0D))"),
          expr("array(transform(shell, p -> CAST(p.lat_c AS DOUBLE) / 100.0D))")).as("polygon_wkb"))

  /** Two-level relation resolve over assembled ways. */
  def assembleRelations(members: DataFrame, ways: DataFrame): DataFrame =
    members
      .join(ways, members("member_way") === ways("way_id"))
      .groupBy(col("relation_id"))
      .agg(count(lit(1)).as("n_member_ways"),
           sum(col("n_points")).as("n_points"),
           min(col("bbox.minx")).as("minx"), min(col("bbox.miny")).as("miny"),
           max(col("bbox.maxx")).as("maxx"), max(col("bbox.maxy")).as("maxy"))

  /** Tag-rule layer routing (flex-style, README.md:93): one scan, N layers. */
  def extractLayers(tagged: DataFrame, layerRules: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    val layerCol = filter(
      array(layerRules.map { case (name, rule) => when(rule, name) }: _*),
      _.isNotNull)
    tagged
      .withColumn("layers", layerCol)
      .where(size(col("layers")) > 0)
      .select(col("*"), explode(col("layers")).as("layer"))
      .drop("layers")
  }

  /** The way→region dimension chain (the reference's per-{region,subregion}
    * routing, `osm_etl.py:69-85`, as joins instead of container fan-out).
    * `customer` grows linearly with scale (GBs at planet sf) so its join
    * goes through the size-gated [[graft.Gate.bcast]] — same hazard class
    * as the node store in [[assembleWays]]; nation/region are
    * constant-cardinality dims (25/5 rows at any sf) and stay
    * hard-broadcast. */
  def regionOfWay(orders: DataFrame, customer: DataFrame,
                  nation: DataFrame, region: DataFrame): DataFrame =
    orders
      .join(graft.Gate.bcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("o_orderkey").as("way_id"), col("r_name").as("region"),
              col("n_name").as("subregion"))

  /** The whole ETL dataflow, session-agnostic (main provisions a session
    * and calls this; OsmEtlJobSpec drives the identical path in-process
    * and chains PostgisLoadJob behind it — the full reference pipeline
    * shape, `osm_etl.py:57-91`). Returns per-lake-table row counts. */
  def run(spark: SparkSession, sfDir: String, outDir: String,
          pgosmDate: String): Seq[(String, Long)] =
    runTimed(spark, sfDir, outDir, pgosmDate)._1

  /** [[run]] plus wall-clock per lake-table write (VERDICT r11 item 3:
    * the chain artifact reported one ETL number, so a slide could not be
    * attributed to a stage). Each stage is one action — the write that
    * materializes that lake table — so the stage seconds sum to the ETL
    * wall (± the count readback, reported as its own stage).
    */
  def runTimed(spark: SparkSession, sfDir: String, outDir: String,
               pgosmDate: String): (Seq[(String, Long)], Seq[(String, Double)]) = {
    // --- scan: star-schema stand-ins for the OSM element stores (FIXTURES.md)
    val refs = T.lineitem(spark, sfDir).select(
      col("l_orderkey").as("way_id"), col("l_linenumber").as("pos"),
      col("l_partkey").as("node_ref"))
    val nodes = T.part(spark, sfDir).select(
      col("p_partkey").as("node_id"),
      (col("p_size").cast("long") * 100).as("lon_c"),
      round(col("p_retailprice") * 100).cast("long").as("lat_c"),
      col("p_brand"), col("p_type"))
    val orders = T.orders(spark, sfDir)

    // --- way + relation assembly
    val ways = assembleWays(refs, nodes)
    val members = orders.select(col("o_custkey").as("relation_id"),
                                col("o_orderkey").as("member_way"))
    val relations = assembleRelations(members, ways)

    // --- layer extraction over the tagged node store
    val layers = extractLayers(
      nodes,
      Seq("heavy" -> (col("lon_c") >= 2500), // p_size >= 25
          "premium" -> (col("lat_c") > 150000))) // retailprice > 1500

    // --- region/date-partitioned lake write (the dump artifact, osm_etl.py:88-91)
    val wayRegions = regionOfWay(orders, T.customer(spark, sfDir),
                                 T.nation(spark, sfDir), T.region(spark, sfDir))
    val stages = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def staged(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      stages += name -> (System.nanoTime() - t0) / 1e9
    }
    staged("ways") {
      ways.join(wayRegions, "way_id")
        .withColumn("pgosm_date", lit(pgosmDate))
        .write.mode("overwrite")
        .partitionBy("region", "subregion", "pgosm_date")
        .parquet(s"$outDir/ways")
    }
    staged("relations") {
      relations.withColumn("pgosm_date", lit(pgosmDate))
        .write.mode("overwrite").partitionBy("pgosm_date").parquet(s"$outDir/relations")
    }
    // area layer (polygon WKB): what osm2pgsql writes for building/water/
    // landuse-class layers; PostGIS load applies ST_GeomFromWKB
    staged("areas") {
      assembleAreas(ways).withColumn("pgosm_date", lit(pgosmDate))
        .write.mode("overwrite").partitionBy("pgosm_date").parquet(s"$outDir/areas")
    }
    staged("layers") {
      layers.withColumn("pgosm_date", lit(pgosmDate))
        .write.mode("overwrite").partitionBy("layer", "pgosm_date").parquet(s"$outDir/layers")
    }
    var counts: Seq[(String, Long)] = Nil
    staged("count_readback") {
      counts = Seq("ways", "relations", "areas", "layers")
        .map(t => t -> spark.read.parquet(s"$outDir/$t").count())
    }
    (counts, stages.toSeq)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val pgosmDate = if (args.length > 2) args(2) else "2024-07-25" // osm_etl.py:13
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"))
      .appName(s"osm-etl-$pgosmDate")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val counts = run(spark, sfDir, outDir, pgosmDate).toMap
    println(s"""{"job":"osm_etl","date":"$pgosmDate","ways":${counts("ways")},""" +
            s""""relations":${counts("relations")},""" +
            s""""areas":${counts("areas")},""" +
            s""""layer_rows":${counts("layers")}}""")
    spark.stop()
  }
}
