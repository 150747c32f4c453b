package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Drift

/** Scale-stress probe for the drift family (dev tooling, test scope):
  * replicates the sf0.1 events corpus k times (value jittered per
  * copy so the KS ladder grows with the data — the worst case for the
  * per-(group, value) count table) and times KS + PSI. The claim
  * under test: both collapse map-side before their one shuffle, so
  * wall-clock tracks the SCAN, not the pair/window work — near-linear
  * in k, no superlinear term. Run:
  * `sbt "Test/runMain graft.ProbeScaleDrift"`.
  */
object ProbeScaleDrift {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    noop(spark.range(1000000).selectExpr("sum(id*2)"))

    val e0 = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"), col("event_id"), col("value"))
    def corpusTimes(k: Int): DataFrame =
      e0.crossJoin(broadcast(
          spark.range(k).select(col("id").as("__c"))))
        .select(col("event_type"),
          (col("event_id") * k + col("__c")).as("event_id"),
          (col("value") + col("__c") * 0.0001).as("value"))

    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[scale] $name%-18s median ${ts.sorted.apply(1)}%6.2f s  (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    for (k <- Seq(1, 4, 16)) {
      val corpus = corpusTimes(k).localCheckpoint(eager = true)
      println(s"[scale] ---- k=$k rows=${corpus.count()} ----")
      time(s"ks    k=$k")(noop(Drift.ksStatisticSplit(corpus,
        col("event_id") % 2 === 0, "event_type", "value")))
      time(s"psi   k=$k")(noop(Drift.psiSplit(corpus,
        col("event_id") % 2 === 0, "event_type", "value", nBins = 10)))
    }
    spark.stop()
  }
}
