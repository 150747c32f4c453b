package graft.queries

import graft.{SparkEntry, SparkSuite}
import graft.operators.Materializer

/** Continuous plan audit over the ENTIRE gated surface — the invariant
  * half of the per-round PLANS_r{N}.md review, run on every `sbt test`
  * instead of episodically: no query may plan a cartesian product.
  * (Broadcast-vs-SMJ choices are stats-driven and AQE re-plans them at
  * runtime, so they stay in the human-reviewed dump; a cartesian is
  * wrong at every scale and every stats estimate.)
  *
  * Plans build under the `lazy` materializer so constructing ~100 plans
  * runs zero Spark jobs — the materializer only truncates lineage, it
  * never introduces a join, so the no-cartesian invariant is unchanged.
  */
class PlanAuditSpec extends SparkSuite {

  test("no gated query plans a CartesianProduct") {
    val prev = spark.conf.getOption(Materializer.ConfKey)
    spark.conf.set(Materializer.ConfKey, "lazy")
    try {
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          val plan = fn(spark, "/root/testdata/sf0.001")
            .queryExecution.executedPlan.toString
          if (plan.contains("CartesianProduct")) Some(name) else None
      }
      assert(offenders.isEmpty,
        s"cartesian product planned by: ${offenders.mkString(", ")}")
    } finally prev match {
      case Some(v) => spark.conf.set(Materializer.ConfKey, v)
      case None => spark.conf.unset(Materializer.ConfKey)
    }
  }
}
