package graft
import org.apache.spark.sql.SparkSession

/** Round-13 probe closing VERDICT_r12 #3: `q_zscore_anomaly` read
  * 3.78 s in BENCH_LOCAL but 0.374 s in the same-session paired run —
  * the documented shared-box noise signature, never adjudicated with
  * the isolated discipline. This probe times the POST-FUSION plan
  * (r13 fused the history/current windows into one conditional
  * aggregation — one fact scan, no join), so it both adjudicates the
  * jump and records the fused plan's isolated floor. The two
  * rank-kernel `_rs` queries ride along so §24's table carries their
  * post-`ProbeScaleRankSelect` numbers next to the crossover
  * evidence (their sf0.1 cost is the flat-regime price of the
  * hot-group insurance arm, per the §15 ProbeSkew table).
  * Isolated fresh-JVM n=5 medians, q_token_count as the
  * stable-history control.
  */
object ProbeNoiseR13 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[probe] $name median ${ts.sorted.apply(2)}%.2f s (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    val dir = "/root/testdata/sf0.1"
    spark.range(1000000).selectExpr("sum(id * 2)")
      .write.format("noop").mode("overwrite").save()
    time("control: q_token_count")(
      noop(graft.queries.PipelineQueries.qTokenCount(spark, dir)))
    time("suspect: q_zscore_anomaly (post-fusion)")(
      noop(graft.queries.ReferenceQueries.qZscoreAnomaly(spark, dir)))
    time("reference: q_baseline_p95_rs (bucket kernel)")(
      noop(graft.queries.ReferenceQueries.qBaselineP95Rs(spark, dir)))
    time("reference: q_mad_anomaly_rs (bucket kernel)")(
      noop(graft.queries.ReferenceQueries.qMadAnomalyRs(spark, dir)))
    spark.stop()
  }
}
