package graft
import org.apache.spark.sql.SparkSession

/** Round-14 probe closing VERDICT_r13 "What's wrong" #1/#2: the
  * official r13 driver bench (`BENCH_LOCAL.json`, total 274.3 s)
  * carries a 13-query tail 3.0-15.7x above the builder's committed
  * same-code HEAD run (`BENCH_DUCK_r13.json`, total 168.1 s), and the
  * five q_ann_* entries drifted 1.2-2.4x r12->r13 in the committed
  * pairings (q_ann_ivf 0.86->1.79, q_ann_ivfpq 1.38->2.48, q_ann_recall
  * 2.06->3.23, q_ann_rrf 0.83->1.79, q_ann_stream_topk 0.83->1.98)
  * despite ProbeArgmin measuring the argmin kernel itself 3x FASTER.
  * Neither jump was adjudicated with the isolated discipline, and the
  * repo's own rule (SURVEY §25 #5) says: no one tunes a plan off an
  * unadjudicated bench number.
  *
  * Method: same measurement as Bench.scala (noop sink so every column
  * is computed), isolated single-JVM run, n=5 per query, median
  * reported with the raw reps. q_token_count rides as the
  * stable-history control (0.35-0.41 s in both disputed artifacts —
  * if the control reads flat while a suspect reads at its committed
  * value, the driver artifact's inflation was box contention, not
  * code). Verdict rule per entry: isolated median within ~1.5x of the
  * committed BENCH_DUCK_r13 spark value => the driver number was
  * noise; isolated median reproducing the driver's inflated value =>
  * real regression, gets a plan fix this round. Results table goes to
  * SURVEY §26 (round-14 state).
  */
object ProbeNoiseR14 {
  // (query, committed spark sec in BENCH_DUCK_r13, disputed driver sec in r13 BENCH_LOCAL)
  val tail: Seq[(String, Double, Double)] = Seq(
    ("q_mm_phash", 0.68, 10.59),
    ("q_pca_moments", 2.18, 15.67),
    ("q_pca_moments_by", 2.63, 16.85),
    ("q_pipeline", 0.78, 6.79),
    ("q_readability", 0.46, 4.24),
    ("q_pivot", 0.28, 2.43),
    ("q_profit_nation", 0.50, 4.11),
    ("q_quota_sample_rs", 0.51, 3.85),
    ("q_dup_substrings", 1.87, 10.00),
    ("q_er_pairs", 1.23, 6.38),
    ("q_percentile", 0.66, 2.95),
    ("q_path_analysis", 0.54, 2.01),
    ("q_dedup_simhash", 1.40, 4.21))
  // (query, r12 committed, r13 committed) — the cross-round drift arm
  val ann: Seq[(String, Double, Double)] = Seq(
    ("q_ann_ivf", 0.86, 1.79),
    ("q_ann_ivfpq", 1.38, 2.48),
    ("q_ann_recall", 2.06, 3.23),
    ("q_ann_rrf", 0.83, 1.79),
    ("q_ann_stream_topk", 0.83, 1.98))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def noop(name: String): Unit =
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    def time(name: String, note: String): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); noop(name); (System.nanoTime() - t0) / 1e9 }
      println(f"[probe] $name%-20s median ${ts.sorted.apply(2)}%6.2f s  ($note)  reps=${ts.map(t => f"$t%.2f").mkString(", ")}")
    }
    // same warm-up as Bench.scala: JVM/codegen/parquet-reader spin-up
    spark.range(1000000).selectExpr("sum(id * 2)")
      .write.format("noop").mode("overwrite").save()
    graft.sources.Tables.all.foreach { t =>
      try spark.read.parquet(s"$dir/$t.parquet").schema catch { case _: Throwable => () }
    }
    time("q_token_count", "control: committed 0.41, driver 0.35")
    tail.foreach { case (q, c, d) =>
      time(q, f"committed $c%.2f, driver $d%.2f (${d / c}%.1fx)") }
    ann.foreach { case (q, r12, r13) =>
      time(q, f"r12 committed $r12%.2f, r13 committed $r13%.2f") }
    time("q_token_count", "control re-run: box drift check")
    spark.stop()
  }
}
