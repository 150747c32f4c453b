package graft

/** Every registered query must execute on the smallest corpus — the
  * guard for empty-group/degenerate-data regressions that the sf0.01
  * oracle gate would only catch after a driver round-trip.
  */
class QueriesSmokeSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val n = fn(spark, dir).count()
      assert(n >= 0)
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }
}
