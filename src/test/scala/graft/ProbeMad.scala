package graft
import org.apache.spark.sql.SparkSession
object ProbeMad {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[probe] $name median ${ts.sorted.apply(1)}%.2f s (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    val dir = "/root/testdata/sf0.1"
    time("mad window")(noop(graft.queries.ReferenceQueries.qMadAnomaly(spark, dir)))
    time("mad bucket")(noop(graft.queries.ReferenceQueries.qMadAnomalyRs(spark, dir)))
    time("p95 window")(noop(graft.queries.ReferenceQueries.qBaselineP95(spark, dir)))
    time("p95 bucket")(noop(graft.queries.ReferenceQueries.qBaselineP95Rs(spark, dir)))
    spark.stop()
  }
}
