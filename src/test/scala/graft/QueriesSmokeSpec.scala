package graft

/** Smoke: every registered query runs on sf0.001 and returns rows; every
  * query has an oracle; entry() is non-empty (the driver's t1 gate).
  */
class QueriesSmokeSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has a matching oracle — zero waivers") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // sketch_distinct, the last rows-only entry, is now oracled by
    // CONTRACT (within-bound booleans the DuckDB side asserts TRUE)
    assert(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet ==
      Set.empty[String])
  }

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name runs and returns rows on sf0.001") {
      assert(fn(spark, dir).count() > 0)
    }
  }
}
