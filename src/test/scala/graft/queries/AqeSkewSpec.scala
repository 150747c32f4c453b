package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** AQE's runtime skew handling — the complement of the explicit
  * Skew.saltedJoin: a sort-merge join whose build shuffles one hot key
  * into a pathological partition gets split at runtime without any
  * query change. Thresholds are lowered so the local-size data
  * exhibits what a 100 TB hot key would.
  */
class AqeSkewSpec extends SparkSuite {

  test("AQE splits skewed sort-merge join partitions at runtime") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      // 95% of 400k fact rows hit key 1
      val facts = spark.range(400000)
        .select(when(pmod(col("id"), lit(20)) < 19, 1L).otherwise(col("id"))
          .as("k"), col("id").as("x"))
      val dim = spark.range(50).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("name"))
      // NOTE: no aggregation on k downstream — a required hash
      // distribution on the join key would (correctly) veto the split
      val joined = facts.join(dim, "k").select(col("k"), col("name"))
      // execute THIS queryExecution (count()/write build a new one and
      // the adaptive plan would never finalize on `joined` itself)
      val n = joined.collect().length
      assert(n > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$plan")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
