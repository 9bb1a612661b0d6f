package graft

import graft.operators.JdbcIO
import org.apache.spark.sql.functions._

/** §2.A `source_jdbc` / `sink_jdbc` against embedded Derby — the
  * offline stand-in for the reference's PostGIS terminal store
  * (`/root/reference/osm_etl.py:88-91`). The registered queries cover
  * value-level correctness vs the DuckDB oracle; this spec additionally
  * asserts the PARALLELISM contract: a partitioned JDBC read must
  * actually stripe the table across numPartitions tasks.
  */
class JdbcSpec extends GraftSuite {

  test("jdbc round-trip preserves rows and types (Derby embedded)") {
    val url = JdbcIO.freshEmbeddedDerby("graft_spec_derby")
    val src = T.nation(spark, sf)
      .select(col("n_nationkey"), col("n_regionkey"), col("n_name"))
    JdbcIO.writeTable(src, url, "nation_rt", columnTypes = Some("n_name VARCHAR(64)"))
    val back = JdbcIO.readTable(spark, url, "nation_rt")
    assert(back.schema.fieldNames.toSet === Set("n_nationkey", "n_regionkey", "n_name"))
    val a = src.orderBy("n_nationkey").collect().map(_.toSeq)
    val b = back.orderBy("n_nationkey").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("postgres dialect emits the DDL a PostGIS layer load needs (no server required)") {
    // The reference's real serving edge is Postgres/PostGIS
    // (`/root/reference/osm_etl.py:88-91`): the dump-reload becomes, on
    // this engine, a direct JDBC write whose CREATE TABLE goes through
    // Spark's PostgresDialect. Assert the exact column DDL Spark would
    // emit for an assembled OSM layer row — geometry WKB as BYTEA, text
    // as TEXT, ids as BIGINT — plus a createTableColumnTypes override,
    // without needing a live server (the DDL string IS the contract).
    import org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
    import org.apache.spark.sql.jdbc.JdbcDialects
    import org.apache.spark.sql.types._
    val dialect = JdbcDialects.get("jdbc:postgresql://db.example/osm")
    val layer = StructType(Seq(
      StructField("osm_id", LongType, nullable = false),
      StructField("name", StringType),
      StructField("layer", StringType),
      StructField("area", DoubleType),
      StructField("n_ring_points", IntegerType),
      StructField("visible", BooleanType),
      StructField("updated_at", TimestampType),
      StructField("geom", BinaryType))) // WKB Polygon/MultiPolygon bytes
    val ddl = JdbcUtils.schemaString(dialect, layer, caseSensitive = false, None)
    assert(ddl.contains("\"osm_id\" BIGINT NOT NULL"))
    assert(ddl.contains("\"name\" TEXT"))
    assert(ddl.contains("\"area\" FLOAT8")) // = double precision
    assert(ddl.contains("\"n_ring_points\" INTEGER"))
    assert(ddl.contains("\"visible\" BOOLEAN"))
    // Spark TimestampType is session-tz-relative → timestamptz; the
    // no-zone variant is TimestampNTZType
    assert(ddl.contains("\"updated_at\" TIMESTAMP WITH TIME ZONE"))
    // WKB geometry lands as BYTEA — the PostGIS load then applies
    // ST_GeomFromWKB(geom) server-side, exactly the osm2pgsql hand-off
    assert(ddl.contains("\"geom\" BYTEA"))
    // createTableColumnTypes pins a column type past the dialect default
    // (the same knob the Derby round-trips use for VARCHAR)
    val pinned = JdbcUtils.schemaString(
      dialect, layer, caseSensitive = false, Some("name VARCHAR(256)"))
    assert(pinned.contains("\"name\" VARCHAR(256)"))
  }

  test("PostgisLoadJob loads a lake dir end-to-end (Derby stand-in)") {
    // The DAG's terminal task (dags/osm_spark_dag.py load_postgis) submits
    // this exact path with a Postgres URL; here the offline Derby URL
    // drives the identical code. Lake shape mirrors OsmEtlJob's output:
    // scalars + a struct (flattens to parent_child) + an array (assembly
    // intermediate, dropped) + WKB binary (passes through).
    import org.apache.spark.sql.functions.{array, lit, struct}
    val lake = java.nio.file.Files.createTempDirectory("graft_pg_lake").toString
    T.nation(spark, sf)
      .select(col("n_nationkey").as("way_id"), col("n_name").as("name"),
        struct(lit(1L).as("minx"), lit(2L).as("miny")).as("bbox"),
        array(lit(1L), lit(2L)).as("pts"),
        expr("CAST(NULL AS BINARY)").as("wkb"))
      .write.parquet(s"$lake/ways")
    T.region(spark, sf)
      .select(col("r_regionkey").as("way_id"), col("r_name").as("layer"))
      .write.parquet(s"$lake/layers")
    val url = JdbcIO.freshEmbeddedDerby("graft_spec_pg_load")
    val loaded = graft.plans.PostgisLoadJob.load(spark, lake, url).toMap
    // relations/areas absent from this lake → skipped, not failed
    assert(loaded.keySet === Set("ways", "layers"))
    assert(loaded("ways") === 25L && loaded("layers") === 5L)
    val back = JdbcIO.readTable(spark, url, "osm_ways")
    assert(back.schema.fieldNames.toSet ===
      Set("way_id", "name", "bbox_minx", "bbox_miny", "wkb")) // pts dropped
    assert(back.where(col("bbox_minx") === 1L).count() === 25L)
  }

  test("partitioned jdbc read stripes across numPartitions connections") {
    val url = JdbcIO.freshEmbeddedDerby("graft_spec_derby_p")
    val src = T.customer(spark, sf).select(col("c_custkey"), col("c_acctbal"))
    JdbcIO.writeTable(src, url, "customer_rt")
    val back = JdbcIO.readTable(spark, url, "customer_rt",
      partitionColumn = Some(("c_custkey", 0L, 150L, 4)))
    // the scan itself must be 4-way (one key-range stripe per task)
    assert(back.rdd.getNumPartitions === 4)
    // stripes are a partition of the key space: nothing lost or duplicated
    assert(back.count() === src.count())
    // first/last stripes are unbounded, so out-of-range keys still arrive
    val urlEdge = JdbcIO.freshEmbeddedDerby("graft_spec_derby_e")
    JdbcIO.writeTable(src, urlEdge, "customer_rt")
    val edge = JdbcIO.readTable(spark, urlEdge, "customer_rt",
      partitionColumn = Some(("c_custkey", 40L, 60L, 4)))
    assert(edge.count() === src.count())
  }
}
