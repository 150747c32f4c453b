package graft
import org.apache.spark.sql.SparkSession

/** Isolated n=3-median probe for q7_volume / q8_mkt_share — VERDICT_r8
  * flagged both jumping 3-4x round-over-round with zero code change
  * (the r7 "neighborhood poisoning" pattern). This re-measures them
  * alone in a fresh JVM, away from the bench's allocation pressure.
  */
object ProbeQ7Q8 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 8).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[probe] $name median ${ts.sorted.apply(4)}%.2f s (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    val dir = "/root/testdata/sf0.1"
    // Join-strategy fingerprint: a broadcast->SMJ flip on the
    // lineitem x orders edge is the plausible real cause if the probe
    // medians do not return to the r7 floor.
    for ((n, q) <- Seq(
        "q7_volume" -> graft.queries.AnalyticsQueries.q7Volume(spark, dir),
        "q8_mkt_share" -> graft.queries.AnalyticsQueries.q8MarketShare(spark, dir))) {
      val phys = q.queryExecution.executedPlan.toString
      def count(tag: String) = tag.r.findAllIn(phys).length
      println(s"[probe] $n joins: bhj=${count("BroadcastHashJoin")} " +
        s"smj=${count("SortMergeJoin")} shj=${count("ShuffledHashJoin")}")
    }
    time("q7_volume")(noop(graft.queries.AnalyticsQueries.q7Volume(spark, dir)))
    time("q8_mkt_share")(noop(graft.queries.AnalyticsQueries.q8MarketShare(spark, dir)))
    spark.stop()
  }
}
