package graft
import org.apache.spark.sql.SparkSession

/** Isolated fresh-JVM probe for q_pagerank (the §17 bench-noise
  * discipline: single-query claims need n>=3 medians outside the
  * shared bench JVM). Run:
  *   sbt -batch "Test/runMain graft.ProbePagerank"
  */
object ProbePagerank {
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
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[probe] $name median ${ts.sorted.apply(1)}%.2f s (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    val dir = "/root/testdata/sf0.1"
    time("pagerank iters=3")(noop(
      graft.queries.AnalyticsQueries.qPagerank(spark, dir)))
    spark.stop()
  }
}
