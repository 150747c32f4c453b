package graft
import org.apache.spark.sql.SparkSession

/** Timing probe for queries added this round, at bench scale. */
object ProbeNewQueries {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_drift_ks", "q_drift_psi", "q_quota_sample", "q_sketch_cms")
    for (n <- names) {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        noop(SparkEntry.queries(n)(spark, dir))
        (System.nanoTime() - t0) / 1e9 }
      println(f"[probe] $n median ${ts.sorted.apply(1)}%.2f s (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
