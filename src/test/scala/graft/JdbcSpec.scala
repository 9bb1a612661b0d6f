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
