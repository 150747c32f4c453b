package graft
import org.apache.spark.sql.SparkSession

/** Round-14 check on VERDICT_r13 #2 (q_pca_moments 2.18 s committed vs
  * DuckDB 0.89 s = 2.4x, the one >2x entry on non-trivial oracle
  * work): the matrix aggregate's map side is d(d+1)/2 shortest-decimal
  * conversions per row, and at sf0.1 the 2,000-row embeddings table is
  * ONE parquet split — 4.3M conversions serialized on one core while
  * 31 idle. Pca.parallelizeInput round-robins the input to
  * defaultParallelism when (and only when) the scan yields fewer
  * splits than cores. This probe times the two gated queries after
  * the guard (isolated pre-fix floors from ProbeNoiseR14: 2.12 /
  * 2.18 s).
  */
object ProbePcaR14 {
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
        (System.nanoTime() - t0) / 1e9 }
      println(f"[probe] $name%-18s median ${ts.sorted.apply(2)}%6.2f s  ($note)  reps=${ts.map(t => f"$t%.2f").mkString(", ")}")
    }
    spark.range(1000000).selectExpr("sum(id * 2)")
      .write.format("noop").mode("overwrite").save()
    graft.sources.Tables.all.foreach { t =>
      try spark.read.parquet(s"$dir/$t.parquet").schema catch { case _: Throwable => () }
    }
    time("q_pca_moments", "pre-fix isolated 2.12 | duck 0.89 | 2x bar 1.78")
    time("q_pca_moments_by", "pre-fix isolated 2.18 | duck 0.95 | 2x bar 1.90")
    spark.stop()
  }
}
