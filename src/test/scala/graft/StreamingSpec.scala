package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._

/** Behavioral streaming semantics (SURVEY.md §5.4): what the DuckDB oracle
  * cannot express — watermark drops and custom state — asserted over real
  * MemoryStream micro-batches.
  */
class StreamingSpec extends GraftSuite {

  test("append-mode windowed agg drops events behind the watermark") {
    val rows = StreamingOps.runWatermarkLateDemo(spark)
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2)))
      .toSet
    // user 1 sent one on-time event at 10:00 and one LATE event (batch 3,
    // behind the advanced watermark) into the same 10:00 window: the late
    // one must NOT be counted.
    val user1w10 = rows.filter(t => t._1.startsWith("2024-01-01 10:00") && t._2 == 1L)
    assert(user1w10.map(_._3) == Set(1L), s"late event leaked into closed window: $rows")
  }

  test("flatMapGroupsWithState accumulates per-user counters across micro-batches") {
    val rows = StreamingOps.runStatefulCounterDemo(spark)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows(1L) == ((2L, 7.0)), s"user 1 state wrong: ${rows(1L)}")
    assert(rows(2L) == ((1L, 3.0)), s"user 2 state wrong: ${rows(2L)}")
  }

  test("transformWithState (v2) matches the flatMapGroupsWithState counters on the shared fixture") {
    val rows = StreamingOps.runTransformWithStateDemo(spark)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows(1L) == ((2L, 7.0)), s"user 1 state wrong: ${rows(1L)}")
    assert(rows(2L) == ((1L, 3.0)), s"user 2 state wrong: ${rows(2L)}")
  }

  test("stream-stream interval join matches in-window pairs and excludes out-of-window") {
    val rows = StreamingOps.runStreamStreamJoinDemo(spark)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    // view 100 (user 1, 10:00) + buy 900 (10:05) → in window, joins.
    // view 200 (user 2, 10:00) + buy 901 (10:30) → outside 10 min, NO join.
    // view 201 (user 2, 10:25) + buy 901 (10:30) → in window, joins.
    assert(rows == Set((1L, 100.0, 900.0), (2L, 201.0, 901.0)), s"got $rows")
  }

  test("batch twins run unchanged as streaming queries (tumbling over a file stream)") {
    // The very same StreamingOps.tumbling plan, driven incrementally from a
    // file source, must reach the batch answer once all data is consumed.
    val base = java.nio.file.Files.createTempDirectory("graft_stream_twin")
    val src = base.resolve("src"); java.nio.file.Files.createDirectories(src)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf, "events.parquet"), src.resolve("events.parquet"))
    // events.ts physical type varies by fixture generation (nanos-long /
    // NTZ micros) → same schema-driven normalization as the batch loader
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(src.toString).schema
    val stream = T.normalizeEventTs(
      spark.readStream.schema(rawSchema).parquet(src.toString))
    val q = StreamingOps.tumbling(stream)
      .writeStream.format("memory").queryName("twin_tumbling")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("twin_tumbling")
      .orderBy(col("window_start"), col("event_type")).collect().toSeq
    val batch = StreamingOps.tumbling(T.events(spark, sf))
      .orderBy(col("window_start"), col("event_type")).collect().toSeq
    assert(streamed == batch)
  }

  test("stream_osm_upsert: continuous replication apply reaches the hand-computed lake state") {
    val got = SparkEntry.queries("stream_osm_upsert")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // v0 = {1:(v1,10), 2:(v1,20)}; batch 0 updates 1, deletes 2, inserts
    // 3 twice (max-version 31.0 must win); batch 1 re-inserts 2.
    assert(got.toSet == Set((1L, 2L, 11.0), (2L, 3L, 22.0), (3L, 2L, 31.0)),
      s"lake state after two replication batches: ${got.toSeq}")
  }
}
