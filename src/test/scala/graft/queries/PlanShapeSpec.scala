package graft.queries

import graft.SparkSuite

/** Locks in the plan shapes that matter at 100 TB: filter pushdown to
  * the scan, broadcast joins for dims, no stray shuffles. A change
  * that silently loses one of these properties fails here, not in a
  * cluster bill.
  */
class PlanShapeSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1_agg: shipdate filter pushed into the parquet scan") {
    val plan = planOf(AnalyticsQueries.q1Agg(spark, dir))
    val pushed = "PushedFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    assert(pushed.contains("LessThanOrEqual(l_shipdate"),
      s"pushdown lost; PushedFilters=[$pushed]")
  }

  test("q5_join: all four dimension tables broadcast") {
    val plan = planOf(AnalyticsQueries.q5Join(spark, dir))
    val broadcasts = "BroadcastExchange".r.findAllIn(plan).length
    assert(broadcasts >= 4, s"expected >=4 broadcast dims, got $broadcasts")
    assert(!plan.contains("SortMergeJoin") || broadcasts >= 4)
  }

  test("q1_agg: scan reads only the columns the query needs") {
    val plan = planOf(AnalyticsQueries.q1Agg(spark, dir))
    val read = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    // 7 columns used; a 16-column lineitem read means pruning broke
    assert(read.split(",").length <= 7, s"column pruning lost: $read")
    assert(!read.contains("l_comment"))
  }

  test("as-of join: bounded shuffle count (union+window, no range probe)") {
    val plan = planOf(AnalyticsQueries.qAsofJoin(spark, dir))
    // key shuffle(s) + final sort only — a naive range join would show
    // a nested-loop or cartesian operator here
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"range-probe plan:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 3, s"expected <=3 key shuffles, got $shuffles")
  }

  test("baseline hostgroups: single aggregation, networks broadcast") {
    val plan = planOf(ReferenceQueries.qThresholds(spark, dir))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      s"networks not broadcast:\n$plan")
    // one partial + one final hash aggregate pair for the metric agg
    // (plus none keyed by anything but network)
    assert("HashAggregate".r.findAllIn(plan).length >= 2)
  }
}
