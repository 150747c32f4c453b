package graft
import org.apache.spark.sql.SparkSession

/** Round-12 probe for the three UNCHANGED-code bench jumps VERDICT_r11
  * flagged as weak — q_grouping_sets (1.00 -> 12.37 s),
  * q_dedup_minhash (1.31 -> 10.48 s), q_interpolate (1.05 -> 9.09 s)
  * between the r10 and r11 BENCH_LOCAL refreshes — plus
  * q_lpm6_enrich's 9.22 s debut (NOTE: this probe runs AFTER the r12
  * string-keyed parse fix, so its number adjudicates the fixed plan;
  * the v4 twin `q_lpm_enrich` rides along as its scale reference).
  * Isolated fresh-JVM n=5 medians (the ProbeNoiseR11 discipline),
  * q_token_count as the stable-history control.
  */
object ProbeNoiseR12 {
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
    // same warm-up the bench main runs, so the first timed query isn't
    // charged for codegen/scheduler spin-up
    spark.range(1000000).selectExpr("sum(id * 2)")
      .write.format("noop").mode("overwrite").save()
    time("control: q_token_count")(
      noop(graft.queries.PipelineQueries.qTokenCount(spark, dir)))
    time("suspect: q_grouping_sets")(
      noop(graft.queries.AnalyticsQueries.qGroupingSets(spark, dir)))
    time("suspect: q_dedup_minhash")(
      noop(graft.queries.PipelineQueries.qDedupMinhash(spark, dir)))
    time("suspect: q_interpolate")(
      noop(graft.queries.AnalyticsQueries.qInterpolate(spark, dir)))
    time("reference: q_lpm_enrich (v4)")(
      noop(graft.queries.ReferenceQueries.qLpmEnrich(spark, dir)))
    time("suspect: q_lpm6_enrich (post-fix)")(
      noop(graft.queries.ReferenceQueries.qLpm6Enrich(spark, dir)))
    spark.stop()
  }
}
