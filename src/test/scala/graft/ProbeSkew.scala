package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Baseline

/** Timing probe for the rank-kernel knob in the HOT-GROUP regime the
  * bucket kernel exists for: one /24 carrying ~100x the rows of every
  * other network. The flat-corpus measurement (ProbeMad) shows the
  * window kernel winning when the group key bounds the population;
  * this probe records the other half of the knob's evidence — numbers
  * land in SURVEY.md §15.
  */
object ProbeSkew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val factor = if (args.nonEmpty) args(0).toInt else 100

    val base = graft.queries.Shared.hostEvents(spark, dir)
      .select(col("host"), col("value"), col("ts"))
    // Hot network = whichever /24 is already largest; replicate its rows
    // `factor-1` extra times with a value jitter per copy (a duplicated
    // multiset would let the sort's equal-key fast paths cheat).
    val byNet = base.groupBy(substring_index(col("host"), ".", 3).as("net"))
      .count().orderBy(desc("count"))
    val hotNet = byNet.head().getString(0)
    val hot = base.filter(substring_index(col("host"), ".", 3) === hotNet)
    val skewed = base.unionAll(
        hot.withColumn("__c", explode(lit((1 until factor).toArray)))
          .withColumn("value", col("value") + col("__c") * 0.001)
          .drop("__c"))
      .localCheckpoint(eager = true) // timing excludes the replication
    val nHot = skewed.filter(substring_index(col("host"), ".", 3) === hotNet).count()
    println(s"[probe] hot net $hotNet rows=$nHot of total=${skewed.count()}")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(build: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); noop(build); (System.nanoTime() - t0) / 1e9 }
      println(f"[probe] $name median ${ts.sorted.apply(1)}%.2f s (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    def withKernel(k: String)(build: => DataFrame): DataFrame = {
      spark.conf.set(Baseline.RankKernelKey, k)
      try build finally spark.conf.unset(Baseline.RankKernelKey)
    }
    val week = 7L * 24 * 3600
    for (k <- Seq("window", "bucket")) {
      time(s"p95 skewed $k")(withKernel(k)(
        Baseline.percentileByPrefix(skewed, "host", "value", "ts",
          week, 24, num = 19, den = 20)))
      time(s"mad skewed $k")(withKernel(k)(
        Baseline.madAnomaly(skewed, "host", "value", "ts",
          windowSeconds = week, currentSeconds = 3600L, prefix = 24,
          kNum = 3, kDen = 1)))
    }
    // Both kernels must still select identical elements on the skewed
    // population (the interchangeability the gate proves on flat data).
    val sel = Seq("window", "bucket").map { k =>
      withKernel(k)(Baseline.percentileByPrefix(skewed, "host", "value",
        "ts", week, 24, num = 19, den = 20))
        .orderBy("network").collect().toSeq
    }
    assert(sel(0) == sel(1), "kernels disagree on the skewed corpus")
    println(s"[probe] kernels agree on ${sel(0).size} networks")
    spark.stop()
  }
}
