package graft

import org.apache.spark.sql.functions._

/** `sim_ivf_partitioned` — the persisted IVF index: trained cluster ids
  * as the lake's partition layout, ANN probe as partition pruning.
  */
class IvfIndexSpec extends GraftSuite {

  private lazy val probe = SparkEntry.queries("sim_ivf_partitioned")(spark, sf)

  test("probe plan prunes the index to the nprobe partitions (file-level)") {
    val p = probe.queryExecution.executedPlan.toString()
    assert(p.contains("PartitionFilters") && p.contains("cid"),
           "probe scan must carry a static cid partition filter")
  }

  test("probed cosines are true cosines and recall@10 is sane") {
    val e = T.embeddings(spark, sf)
    val q = e.where(col("vec_id") === 0).select(col("embedding").as("qe"))
    val brute = e.where(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"),
              round(graft.functions.CosineSimilarity(col("embedding"), col("qe")), 6).as("cosine"))
    val bruteTop = brute.orderBy(col("cosine").desc, col("vec_id")).limit(10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = probe.collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.length === 10)
    // no fabricated scores: every reported cosine equals the brute-force
    // value for that vector
    val all = brute.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.foreach { case (id, c) => assert(math.abs(all(id) - c) < 1e-9) }
    // bounded-approximation contract: most of the true top-10 found
    val recall = got.count { case (id, _) => bruteTop.contains(id) } / 10.0
    assert(recall >= operators.RecallFloors.simIvfPartitioned,
      s"recall@10 = $recall too low for nprobe=3 of 8 cells")
  }
}
