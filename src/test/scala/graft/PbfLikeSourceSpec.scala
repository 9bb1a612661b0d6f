package graft

import graft.sources.{GraftBlockFormat, OsmSyntheticSource}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** `source_pbf_blocks` — the PBF-shaped blockwise binary source: split
  * planning from block headers, id-range block skipping, pruned decode.
  */
class PbfLikeSourceSpec extends GraftSuite {

  private lazy val file: String = {
    val f = java.nio.file.Files.createTempDirectory("graft_blk_spec")
      .resolve("elements.graftblk").toString
    GraftBlockFormat.write(f,
      (0L until 10000L).iterator.map(i => GraftBlockFormat.Elem(
        i, OsmSyntheticSource.kindOf(i), s"n${i % 97}",
        OsmSyntheticSource.lonOf(i), OsmSyntheticSource.latOf(i))),
      blockSize = 1000)
    f
  }

  private def read = spark.read.format("graft.sources.OsmPbfLikeSource")
    .option("path", file).load()

  private def batchScan(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))

  test("round-trips every element through the varint/string-table codec") {
    val back = read.orderBy("element_id").collect()
    assert(back.length === 10000)
    val r = back(4242)
    assert(r.getLong(0) === 4242L)
    assert(r.getString(1) === OsmSyntheticSource.kindOf(4242))
    assert(r.getString(2) === "n" + (4242 % 97))
    assert(r.getLong(3) === OsmSyntheticSource.lonOf(4242))
    assert(r.getLong(4) === OsmSyntheticSource.latOf(4242))
  }

  test("splits are blocks; id-range predicate skips whole blocks at planning") {
    val full = batchScan(read)
    assert(full.inputRDD.getNumPartitions === 10, "one split per 1000-element block")
    val filtered = read.where(col("element_id") >= 7100L)
    val scan = batchScan(filtered)
    // blocks [0,999]..[6999] cannot match → only 3 of 10 blocks planned
    assert(scan.inputRDD.getNumPartitions === 3, scan.scan.description())
    assert(scan.scan.description().contains("blocks=3/10"))
    // row-grain re-check inside the surviving edge block
    assert(filtered.count() === 2900)
    // equality probe: one block planned, one row out
    val eq = read.where(col("element_id") === 5500L)
    assert(batchScan(eq).inputRDD.getNumPartitions === 1)
    assert(eq.count() === 1)
  }

  test("column pruning reaches the scan (string decode skipped when unprojected)") {
    val pruned = read.select(col("element_id"), col("lon_c"))
    val scan = batchScan(pruned)
    assert(scan.scan.readSchema().fieldNames.toSeq === Seq("element_id", "lon_c"))
    // values still correct through the string-skipping decode path
    val r = pruned.where(col("element_id") === 9999L).collect()
    assert(r.length === 1 && r(0).getLong(1) === OsmSyntheticSource.lonOf(9999))
  }

  test("registered query matches its own oracle shape and the pushed bounds") {
    val df = SparkEntry.queries("source_pbf_blocks")(spark, sf)
    assert(df.columns.toSeq === Seq("element_id", "kind", "name", "lon_c"))
    assert(df.count() === 5000)
  }
}
