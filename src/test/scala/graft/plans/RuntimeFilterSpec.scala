package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.sources.Tables

/** At cluster scale a selective dim-side filter should reach the fact
  * scan as a runtime bloom filter (Catalyst's InjectRuntimeFilter), so
  * the shuffle only carries fact rows that can possibly join — the
  * row-level complement to static partition pruning. This spec pins
  * the configuration under which Spark injects it for the corpus'
  * canonical fact-dim join, so the scale path is demonstrated, not
  * assumed.
  */
class RuntimeFilterSpec extends SparkSuite {

  test("selective dim filter injects a bloom filter on the fact side") {
    val dir = "/root/testdata/sf0.001"
    withSQLConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // the test corpus is tiny; drop the size floors so the rule
      // fires at sf0.001 exactly as it would on TB-sized inputs
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val li = Tables.load(spark, dir, "lineitem")
      val ord = Tables.load(spark, dir, "orders")
        .filter(col("o_totalprice") > 400000.0) // selective dim filter
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n$plan")
      // and it still computes the right thing
      assert(joined.count() > 0)
    }
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      f
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
