package graft

import org.apache.spark.sql.functions._

/** Round-17 invariants.
  *
  * `agg_weighted_median` plan pin (VERDICT r16 #1): the quantity-weighted
  * median must never run a running-weight window partitioned solely by
  * `l_returnflag` — on this corpus the distinct-(flag, price) table is
  * quasi-fact-sized (594k/600k at sf0.1), so a |flags|-partition window
  * is three single-task sorts that grow unboundedly with the corpus. The
  * rewrite rides the partial-offset device: the ONLY WindowExec allowed
  * is the local one partitioned by (_pid, l_returnflag). Semantics stay
  * pinned by the Round16 hand-recompute spec and the DuckDB oracle.
  */
class Round17OpsSpec extends GraftSuite {

  test("agg_weighted_median: no window partitioned solely by flag (partial-offset plan)") {
    val df = SparkEntry.queries("agg_weighted_median")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val windowLines = plan.split("\n").filter(_.contains("Window "))
    assert(windowLines.nonEmpty, s"expected the local cumulative window in plan:\n$plan")
    windowLines.foreach { line =>
      assert(line.contains("_pid"),
        s"running-weight window must be partitioned by (_pid, flag), not flag alone:\n$line")
    }
    // and the result still materializes (offsets joined back correctly)
    assert(df.count() == 3)
    Caches.drain()
  }
}
