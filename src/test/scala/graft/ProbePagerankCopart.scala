package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe for the r18 pagerank co-partitioning claim: with the
  * loop-invariant edge table hash-partitioned by src BEFORE its
  * checkpoint, one round's contribution join (edges x ranks on
  * src = node) plans with NO exchange under the join — the only
  * exchange left in a round is the dst aggregate's. Prints the round
  * plan's Exchange count for the partitioned and unpartitioned edge
  * builds. Run: sbt "Test/runMain graft.ProbePagerankCopart"
  */
object ProbePagerankCopart {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "false")
      // the at-scale regime: a node-count-sized ranks table does NOT
      // broadcast; the contribution join is a shuffle join, and the
      // question is whether the pre-partitioned checkpoint spares the
      // edge side its per-round exchange
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val raw = spark.range(200000).select(
      (col("id") % 5000).as("src"), (pmod(col("id") * 31, lit(5000))).as("dst"))
    def roundPlan(partitioned: Boolean): String = {
      val e0 = raw.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      val e = (if (partitioned) e0.repartition(col("src")) else e0)
        .localCheckpoint(eager = true)
      val deg = e.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg")).localCheckpoint(eager = true)
      val ranks = deg.select(col("node"), col("deg"),
        lit(1000000000L).as("rank_fp"))
      val inflow = e.join(ranks, e("src") === ranks("node"))
        .select(col("dst"), expr("rank_fp div deg").as("__c"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("__c").cast("decimal(38,0)")).as("__in"))
      val next = deg.join(inflow.withColumn("__has", lit(1)), Seq("node"), "left")
        .select(col("node"), col("deg"), col("__in"))
      next.queryExecution.executedPlan.toString
    }
    for (p <- Seq(false, true)) {
      val plan = roundPlan(p)
      val n = "Exchange".r.findAllIn(plan).length
      println(s"[probe] partitioned=$p roundExchanges=$n")
      if (args.contains("-v")) println(plan)
    }
    spark.stop()
  }
}
