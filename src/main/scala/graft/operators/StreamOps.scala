package graft.operators

import graft.{Q, T}
import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._

/** SURVEY.md §2.I — streaming operators, registered through their batch
  * twins.
  *
  * Each oracled entry calls the SAME `StreamingOps` transform that a
  * `readStream` pipeline uses — in batch mode the watermark is analyzed
  * away and the plan executes once, which is exactly Structured Streaming's
  * batch/stream unification. Behavioral rows (watermark drops, custom
  * state) can't be expressed in batch; their smoke entries run real
  * in-process micro-batches via MemoryStream (plus assertions in
  * StreamingSpec).
  */
object StreamOps {

  val all: Seq[Q] = Seq(
    Q(
      "stream_tumbling",
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |       count(*) AS n_events,
        |       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin
    ) { (s, d) =>
      StreamingOps.tumbling(T.events(s, d))
        .orderBy(col("window_start"), col("event_type"))
    },

    Q(
      "stream_sliding",
      """SELECT make_timestamp(((CAST(floor(epoch(ts) / 900) AS BIGINT) * 900) - i * 900) * 1000000) AS window_start,
        |       event_type, count(*) AS n_events
        |FROM events, unnest([0, 1, 2, 3]) AS t(i)
        |GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin
    ) { (s, d) =>
      // 1h window sliding every 15min → every event lands in exactly 4
      // windows; the oracle materializes that expansion arithmetically.
      StreamingOps.sliding(T.events(s, d))
        .orderBy(col("window_start"), col("event_type"))
    },

    Q(
      "stream_session",
      """WITH l AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts, value,
        |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM l)
        |SELECT min(ts) AS session_start,
        |       max(ts) + INTERVAL 30 MINUTE AS session_end,
        |       user_id, count(*) AS n_events,
        |       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin
    ) { (s, d) =>
      // session_window(gap=30m): the oracle is the classic lag+cumsum
      // sessionization — same semantics, which is precisely what the
      // emulation-is-oracle-able note in SURVEY §2.I means.
      StreamingOps.sessions(T.events(s, d))
        .orderBy(col("user_id"), col("session_start"))
    },

    Q(
      "stream_dedup",
      """SELECT event_type, count(*) AS n_events,
        |       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin
    ) { (s, d) =>
      // Double the input, dedup on (event_id, ts) → original stream back.
      // In streaming this is exactly-once delivery within the watermark
      // horizon; duplicated identical rows make the batch check meaningful.
      val ev = T.events(s, d)
      StreamingOps.dedup(ev.unionByName(ev))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
             round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2).as("sum_value"))
        .orderBy(col("event_type"))
    },

    Q(
      "stream_static_join",
      """SELECT c_mktsegment, count(*) AS n_events,
        |       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
        |FROM events
        |JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin
    ) { (s, d) =>
      // Stream enriched with a static dim: dim broadcast per micro-batch,
      // no streaming state at all.
      StreamingOps.enrich(T.events(s, d), T.customer(s, d), "user_id", "c_custkey")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"),
             round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2).as("sum_value"))
        .orderBy(col("c_mktsegment"))
    },

    // Behavioral: real micro-batches over MemoryStream. Driver checks
    // rows > 0; StreamingSpec asserts the semantics (late row dropped,
    // state accumulates across batches).
    Q.smoke("stream_watermark_late") { (s, _) =>
      StreamingOps.runWatermarkLateDemo(s).orderBy(col("window_start"), col("user_id"))
    },

    Q.smoke("stream_stateful_custom") { (s, _) =>
      StreamingOps.runStatefulCounterDemo(s).orderBy(col("user_id"))
    },

    // Spark 4 arbitrary state v2 (transformWithState): typed named state
    // handles + TTL + timers on RocksDB-backed state. Same fixture and
    // same emitted counts as the v1 flatMapGroupsWithState demo above —
    // StreamingSpec pins the two APIs to identical results.
    Q.smoke("stream_transform_with_state") { (s, _) =>
      StreamingOps.runTransformWithStateDemo(s).orderBy(col("user_id"))
    },

    // Stream-stream interval join: both sides watermarked, join condition
    // time-bounded → state expires. StreamingSpec asserts the in/out-of-
    // window pairs.
    Q.smoke("stream_stream_join") { (s, _) =>
      StreamingOps.runStreamStreamJoinDemo(s)
        .orderBy(col("user_id"), col("view_id"), col("buy_id"))
    },

    // foreachBatch hand-off sink (§2.A sink_stream_foreachbatch): the
    // dump-then-load pattern as a checkpointed exactly-once batch write —
    // each micro-batch lands idempotently under its batch id, then is
    // atomically visible to the consumer. Exercised over a MemoryStream
    // fed in two batches; returns the union of handed-off artifacts.
    Q.smoke("sink_stream_foreachbatch") { (s, _) =>
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val base = java.nio.file.Files.createTempDirectory("graft_feb")
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double)]
      val q = mem.toDF().toDF("id", "v").writeStream
        .option("checkpointLocation", s"$base/chk")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          batch.write.mode("overwrite").parquet(s"$base/out/batch_$batchId"); ()
        }.start()
      try {
        mem.addData((1L, 1.5), (2L, 2.5)); q.processAllAvailable()
        mem.addData((3L, 3.5)); q.processAllAvailable()
      } finally q.stop()
      s.read.parquet(s"$base/out/batch_0", s"$base/out/batch_1")
        .orderBy(col("id"))
    },

    // Incremental file source + checkpointed foreachBatch hand-off — the
    // reference's dump-then-load (`osm_etl.py:88-91`) with exactly-once
    // batch ids instead of a SQL-dump file.
    Q.smoke("source_stream_file") { (s, d) =>
      val base = java.nio.file.Files.createTempDirectory("graft_stream_file")
      val src = base.resolve("src"); java.nio.file.Files.createDirectories(src)
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(d, "region.parquet"), src.resolve("region.parquet"))
      val schema = T.region(s, d).schema
      StreamingOps.runFileStreamDemo(s, src.toString, s"$base/out", s"$base/chk", schema)
      s.read.parquet(s"$base/out/batch_0").orderBy(col("r_regionkey"))
    }
  )
}
