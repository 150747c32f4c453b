package graft
import org.apache.spark.sql.SparkSession

/** Second r14 noise adjudication: the post-commit BENCH_LOCAL refresh
  * (97e4d56) moved three dedup-family entries UP against the paired
  * r14 artifact cut the same session (BENCH_DUCK_r14.json):
  * q_dedup_semantic 0.43 -> 1.54, q_dedup_semantic_inc 0.59 -> 2.84,
  * q_dedup_clusters 2.68 -> 4.00 — same code both cuts (the only
  * source change between them, the AutoBucket knob, leaves every
  * maxBucket=0 gate plan byte-identical). SURVEY §25 #5: adjudicate
  * with the isolated fresh-JVM discipline before anyone tunes a plan
  * off either number. Same method as [[ProbeNoiseR14]]: noop sink,
  * n=5 medians, q_token_count as the stable-history control.
  */
object ProbeNoiseR14b {
  // (query, paired BENCH_DUCK_r14 spark sec, drifted refresh sec)
  val suspects: Seq[(String, Double, Double)] = Seq(
    ("q_dedup_semantic", 0.43, 1.54),
    ("q_dedup_semantic_inc", 0.59, 2.84),
    ("q_dedup_clusters", 2.68, 4.00))

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
    spark.range(1000000).selectExpr("sum(id * 2)")
      .write.format("noop").mode("overwrite").save()
    graft.sources.Tables.all.foreach { t =>
      try spark.read.parquet(s"$dir/$t.parquet").schema catch { case _: Throwable => () }
    }
    time("q_token_count", "control: r14 paired 0.25, refresh 0.22")
    suspects.foreach { case (q, paired, refresh) =>
      time(q, f"paired $paired%.2f, refresh $refresh%.2f (${refresh / paired}%.1fx)") }
    time("q_token_count", "control re-run: box drift check")
    spark.stop()
  }
}
