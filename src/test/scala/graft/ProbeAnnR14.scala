package graft
import org.apache.spark.sql.SparkSession

/** Round-14 follow-up to [[ProbeNoiseR14]]: that probe adjudicated the
  * ANN-family r12->r13 drift as REAL (isolated medians 1.43-2.90 s vs
  * r12 committed 0.86-2.06). Root cause: r13's `nearestCell` returned
  * a Column, inlining the O(nlist x dim) distance array into BOTH
  * argmin operands — the corpus paid the distance computation twice
  * (ProbeArgmin had measured the idiom over a NAMED column, where
  * CollapseProject keeps the array materialized once). This probe
  * times the five drifted queries (plus q_kmeans and
  * q_hard_negatives, which share the kernel family) after the
  * `IvfIndex.withCell` named-column fix. Success = medians back at or
  * under the r12 committed values.
  */
object ProbeAnnR14 {
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
      println(f"[probe] $name%-20s median ${ts.sorted.apply(2)}%6.2f s  ($note)  reps=${ts.map(t => f"$t%.2f").mkString(", ")}")
    }
    spark.range(1000000).selectExpr("sum(id * 2)")
      .write.format("noop").mode("overwrite").save()
    graft.sources.Tables.all.foreach { t =>
      try spark.read.parquet(s"$dir/$t.parquet").schema catch { case _: Throwable => () }
    }
    time("q_ann_ivf", "r12 0.86 | r13 1.79 | pre-fix isolated 1.43")
    time("q_ann_ivfpq", "r12 1.38 | r13 2.48 | pre-fix isolated 1.99")
    time("q_ann_recall", "r12 2.06 | r13 3.23 | pre-fix isolated 2.90")
    time("q_ann_rrf", "r12 0.83 | r13 1.79 | pre-fix isolated 1.60")
    time("q_ann_stream_topk", "r12 0.83 | r13 1.98 | pre-fix isolated 1.64")
    time("q_hard_negatives", "r13 1.47 (new in r13, rode the slow kernel)")
    time("q_kmeans", "r12 1.24 | r13 1.19 (inline idiom in both — control)")
    spark.stop()
  }
}
