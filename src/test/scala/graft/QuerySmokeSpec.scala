package graft

/** Every contract query runs without throwing and returns rows on the
  * smoke fixture — the same invariant the driver's Verify pass needs
  * (a throwing query silently zeroes its correctness score). */
class QuerySmokeSpec extends SparkTestBase {
  initQuiet()

  Registry.all.foreach { q =>
    test(s"${q.name} runs and returns rows at sf0.001") {
      val n = q.fn(spark, sfDir).count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle name exists in queries") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }
}
