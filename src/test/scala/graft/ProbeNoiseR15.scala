package graft
import org.apache.spark.sql.SparkSession

/** Round-15 probe closing VERDICT_r14 "What's wrong" #2: the official
  * round-14 driver bench (committed as `BENCH_LOCAL.json`, total
  * 211.1 s) carries a fresh 16-entry tail 3.0-13.2x above the builder's
  * committed same-session run (`BENCH_DUCK_r14b.json` spark arm, total
  * 131.2 s, same code) — clustered alphabetically in the g-i span of
  * the sequential sweep, the §26.1/§26.9 contention shape. The repo's
  * rule says adjudicate before trusting, so: isolated fresh-JVM n=5
  * medians per suspect, q_token_count as the stable-history control
  * (0.221/0.271 in the two disputed artifacts).
  *
  * Verdict rule per entry: isolated median within ~1.5x of the
  * committed BENCH_DUCK_r14b spark value => the driver number was box
  * contention; isolated median reproducing the driver's inflated value
  * => real regression, gets a plan fix this round. Results go to
  * SURVEY §28 (round-15 state).
  *
  * This is the LAST round this tax is paid by hand: Bench now
  * self-adjudicates (any median >3x its previous committed
  * BENCH_LOCAL entry and >0.5 s over it re-runs once, keeps the min,
  * and logs the replaced median under "retried") — see
  * [[Bench.needsRetry]] and BenchAdjudicationSpec.
  */
object ProbeNoiseR15 {
  // (query, committed same-session sec in BENCH_DUCK_r14b spark arm,
  //  disputed driver sec in the committed r14 BENCH_LOCAL)
  val tail: Seq[(String, Double, Double)] = Seq(
    ("q_hopping_window", 0.44, 5.79),
    ("q_hostgroups", 0.34, 3.84),
    ("q_hysteresis", 0.24, 2.37),
    ("q_readability", 0.33, 3.14),
    ("q_hostgroup_lifecycle", 0.36, 3.25),
    ("q_interval_join", 0.28, 2.48),
    ("q_mrl_distortion", 0.22, 1.64),
    ("q_interpolate", 1.02, 6.65),
    ("q_novelty", 0.98, 5.93),
    ("q_html_extract", 0.44, 2.61),
    ("q_hopping_distinct", 1.58, 9.26),
    ("q_moving_window", 0.18, 1.00),
    ("q_normalize", 0.49, 2.46),
    ("q_grouping_sets", 0.98, 4.09),
    ("q_baseline_ewma", 0.42, 1.73),
    ("q_baseline_p95", 0.34, 1.06))

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
      println(f"[probe] $name%-22s median ${ts.sorted.apply(2)}%6.2f s  ($note)  reps=${ts.map(t => f"$t%.2f").mkString(", ")}")
    }
    // same warm-up as Bench.scala: JVM/codegen/parquet-reader spin-up
    spark.range(1000000).selectExpr("sum(id * 2)")
      .write.format("noop").mode("overwrite").save()
    graft.sources.Tables.all.foreach { t =>
      try spark.read.parquet(s"$dir/$t.parquet").schema catch { case _: Throwable => () }
    }
    time("q_token_count", "control: committed 0.22, driver 0.27")
    tail.foreach { case (q, c, d) =>
      time(q, f"committed $c%.2f, driver $d%.2f (${d / c}%.1fx)") }
    time("q_token_count", "control re-run: box drift check")
    spark.stop()
  }
}
