package graft
import org.apache.spark.sql.SparkSession

/** Round-15 per-entry medians for the queries whose kernels changed
  * this round (VERDICT_r14 #1/#3/#4/#6), isolated fresh-JVM n=5 with
  * the q_token_count control — the committed comparison points are the
  * r14b paired run (spark / duckdb seconds):
  *
  *   q_dsir_select    1.39 / 0.50  (global rank -> bucket device)
  *   q_dup_clean      1.97 / 0.79  (span frame single-consumer fold)
  *   q_dup_substrings 1.69 / 0.65  (family baseline, no code change)
  *   q_dup_substrings_by 1.72 / 0.86
  *   q_dup_passages   1.54 / 1.03
  *   q_repetition     1.28 / 0.44  (HOF chains -> codegen'd kernel)
  *   q_pagerank       3.67 / 0.47  (early-exit wired; see
  *                                  ProbePagerank for the
  *                                  floor-vs-data decomposition)
  */
object ProbeR15Entries {
  val entries: Seq[(String, Double, Double)] = Seq(
    ("q_dsir_select", 1.39, 0.50),
    ("q_dup_clean", 1.97, 0.79),
    ("q_dup_substrings", 1.69, 0.65),
    ("q_dup_substrings_by", 1.72, 0.86),
    ("q_dup_passages", 1.54, 1.03),
    ("q_repetition", 1.28, 0.44),
    ("q_pagerank", 3.67, 0.47))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String, note: String): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-22s median ${ts.sorted.apply(2)}%6.2f s  " +
        s"($note)  reps=${ts.map(t => f"$t%.2f").mkString(", ")}")
    }
    spark.range(1000000).selectExpr("sum(id * 2)")
      .write.format("noop").mode("overwrite").save()
    graft.sources.Tables.all.foreach { t =>
      try spark.read.parquet(s"$dir/$t.parquet").schema catch { case _: Throwable => () }
    }
    time("q_token_count", "control")
    entries.foreach { case (q, sp, du) =>
      time(q, f"r14b spark $sp%.2f, duckdb $du%.2f") }
    time("q_token_count", "control re-run")
    spark.stop()
  }
}
