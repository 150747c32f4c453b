package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-slope probe for E4 fixed-point k-means: per iteration the
  * assignment is row-local (k×d literals) and the update is one
  * map-side-combined grouped sum over k×d keys, so the fit should be
  * near-LINEAR in rows and in k. Synthetic vectors off spark.range
  * (d = 64, values in [0, 1)).
  * Run: sbt -batch "Test/runMain graft.ProbeScaleKmeans"
  */
object ProbeScaleKmeans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[probe] $name median ${ts.sorted.apply(1)}%.2f s (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    def vecs(n: Long) = spark.range(n)
      .select(col("id").as("vec_id"),
        expr("transform(sequence(1, 64)," +
          " j -> pmod(hash(id, j), 1000) / 1000.0)").as("embedding"))

    for (n <- Seq(25000L, 100000L, 400000L))
      time(s"rows=$n k=8 iters=3") {
        graft.operators.KMeansFixed.fit(vecs(n), "vec_id", "embedding",
          k = 8, iters = 3) }
    for (k <- Seq(8, 32))
      time(s"rows=50k k=$k iters=3") {
        graft.operators.KMeansFixed.fit(vecs(50000L), "vec_id", "embedding",
          k = k, iters = 3) }
    spark.stop()
  }
}
