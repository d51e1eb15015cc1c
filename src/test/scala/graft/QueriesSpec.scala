package graft

/** Every declared query must run and return rows on sf0.001, and every query
  * key with an oracle must exist in `queries`.
  */
class QueriesSpec extends SparkSpec {

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs and returns rows at sf0.001") {
      assert(fn(spark, sfDir).count() > 0)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
