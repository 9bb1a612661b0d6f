package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 invariants. The first test is the cross-check VERDICT r12
  * item 2 asked to keep: the registered event_rfm plan replaced the
  * single-task `ntile(5) OVER (ORDER BY ...)` with a range-partitioned
  * two-phase rank — this pins, at fixture scale, that the distributed
  * plan is bit-identical to the classic global window it replaced.
  */
class Round13OpsSpec extends GraftSuite {

  test("event_rfm: distributed two-phase ntile == single-task window ntile, bit-for-bit") {
    val got = SparkEntry.queries("event_rfm")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    // The replaced plan, verbatim: global windows over the per-user table.
    val u = T.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(max(unix_millis(col("ts"))).as("last_ms"),
           count(lit(1)).as("n_events"),
           sum(Det.dec2(col("value"))).as("monetary"))
    // partitionBy(lit(0)) = the same single global partition as the bare
    // Window.orderBy (one group), without tripping the WindowExec
    // "No Partition Defined" warning this suite asserts is gone.
    def sc(c: String) = ntile(5).over(Window.partitionBy(lit(0)).orderBy(col(c), col("user_id")))
    val want = u.withColumn("r", sc("last_ms"))
      .withColumn("f", sc("n_events"))
      .withColumn("m", sc("monetary"))
      .select(col("user_id"), col("r").cast("long"), col("f").cast("long"),
              col("m").cast("long"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
                                  r.getLong(1) * 100 + r.getLong(2) * 10 + r.getLong(3))))
      .toMap
    assert(got.keySet == want.keySet)
    for ((uid, w) <- want)
      assert(got(uid) == w, s"user $uid: distributed ${got(uid)} vs window $w")
  }
}
