package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the third round-12 batch. `fn_try`,
  * `join_lateral`, `sql_recursive_cte`, `fn_variant`, and the new SQL
  * keys are oracled; this file pins the non-oracled sketch key and the
  * error-lane semantics the hash compare can't state.
  */
class Round12cOpsSpec extends GraftSuite {

  test("agg_hll_union: per-slice and unioned estimates sit in HLL's error envelope") {
    val est = SparkEntry.queries("agg_hll_union")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val li = T.lineitem(spark, sf)
    val exactAll = li.select(countDistinct(col("l_partkey"))).collect().head.getLong(0)
    val exactPer = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // lgK=14 ⇒ rsd ≈ 0.8%; allow 5% slack at fixture cardinalities
    def close(e: Long, t: Long) = math.abs(e - t) <= math.max(1L, (t * 0.05).toLong)
    for ((flag, t) <- exactPer)
      assert(close(est(flag), t), s"slice $flag: est ${est(flag)} vs exact $t")
    assert(close(est("ALL"), exactAll), s"union: est ${est("ALL")} vs exact $exactAll")
    for (f <- exactPer.keySet)
      assert(est("ALL") >= est(f),
        s"union estimate ${est("ALL")} undercuts slice $f (${est(f)}) — " +
          "union registers are the pointwise max, so this must hold")
    assert(exactPer.keySet.map(est).forall(_ <= est("ALL") + (exactAll * 0.05).toLong),
      "no slice estimate may exceed the union beyond envelope")
  }

  test("fn_try: failure lanes are NULL, success lane round-trips, no row is lost") {
    val rows = SparkEntry.queries("fn_try")(spark, sf)
    val n = T.lineitem(spark, sf).count()
    assert(rows.count() == n, "try_* must never drop rows — that is its whole point")
    val sample = rows.limit(200).collect()
    assert(sample.forall(_.isNullAt(3)), "alpha flag cast must fail to NULL")
    assert(sample.forall(r => !r.isNullAt(4)), "numeric string cast must succeed")
    assert(sample.filter(_.getInt(1) == 1).forall(_.isNullAt(2)),
      "division by zero (linenumber 1) must be NULL, not an error")
  }
}
