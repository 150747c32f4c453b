package graft
import org.apache.spark.sql.SparkSession

/** Explode plan vs matrix aggregate for the PCA moment pass (E3) —
  * same bit-exact result, measured cost. Run:
  *   sbt -batch "Test/runMain graft.ProbeMoments"
  */
object ProbeMoments {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Any): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[probe] $name median ${ts.sorted.apply(1)}%.2f s (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    val df = graft.sources.Tables.load(spark, "/root/testdata/sf0.1",
      "embeddings")
    time("explode path")(graft.operators.Pca.topComponent(df, "embedding"))
    time("matrix agg  ")(graft.operators.Pca.topComponentFast(df, "embedding", 64))
    val a = graft.operators.Pca.topComponent(df, "embedding")
    val b = graft.operators.Pca.topComponentFast(df, "embedding", 64)
    println(s"[probe] equal=${a == b}")
    spark.stop()
  }
}
