package graft

/** Driver-contract invariants (SURVEY.md §7.1). */
class EntrySpec extends GraftSuite {

  test("registry keys are unique") {
    val keys = SparkEntry.registry.map(_.key)
    assert(keys.size == keys.distinct.size,
           s"duplicate keys: ${keys.diff(keys.distinct).distinct}")
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("flagship entry returns rows on the smoke tier") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query executes at sf0.001") {
    val failures = SparkEntry.registry.flatMap { q =>
      try { q.run(spark, sf).count(); None }
      catch { case e: Throwable => Some(q.key -> e.getMessage.take(120)) }
    }
    assert(failures.isEmpty, s"queries failed: $failures")
  }
}
