package graft
import org.apache.spark.sql.SparkSession

/** Round-11 probe for the two UNCHANGED-code bench jumps VERDICT_r10
  * flagged as weak: q_fingerprint 0.35 -> 2.60 s (7.4x) and
  * q_dedup_simhash 1.07 -> 5.24 s (4.9x) between the r9 and r10
  * BENCH_LOCAL refreshes. Isolated fresh-JVM n=5 medians (the ProbeMad
  * discipline that cleared q_mad_anomaly_rs in r10), with q_token_count
  * as a stable-history control: if the control holds its historical
  * time while the suspects match their r9 numbers, the r10 jumps were
  * shared-box noise inside the full 161-query bench run.
  */
object ProbeNoiseR11 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
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
    time("suspect: q_fingerprint")(
      noop(graft.queries.PipelineQueries.qFingerprint(spark, dir)))
    time("suspect: q_dedup_simhash")(
      noop(graft.queries.PipelineQueries.qDedupSimhash(spark, dir)))
    spark.stop()
  }
}
