package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 probe for VERDICT_r14 next-round #3: `q_pagerank` reads
  * 6.0-7.8x its (millisecond) DuckDB oracle in both committed r14
  * pairings, and the premium has never had its own probe. The plan
  * shape is the scale-correct one (per-round node-keyed equi-join +
  * map-side-combinable sum + Materializer truncation), so the question
  * is the DECOMPOSITION: how much of the wall is a per-round fixed
  * floor (job scheduling + localCheckpoint write of a node-sized
  * frame) vs per-round data cost — and whether the new early-exit
  * check adds measurable overhead at the gated iters=3.
  *
  * Method (box-noise discipline, SURVEY §25 #5): all arms interleaved
  * within one JVM, rep-major order, n=5 reps, median per arm.
  *   - iters ∈ {1, 2, 4, 8} on the full sf0.1 purchase graph and on a
  *     half slice (customers with even keys): a fixed floor shows as
  *     a nonzero intercept of time(iters) identical across sizes; data
  *     cost shows in the slope ratio between sizes.
  *   - earlyExit on/off at iters=3 (the gated setting; the graph does
  *     not converge in 3 rounds, so the delta IS the check's cost).
  */
object ProbePagerank {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def edgesOf(half: Boolean): DataFrame = {
      val orders0 = spark.read.parquet(s"$dir/orders.parquet")
      val orders = if (half) orders0.filter(col("o_custkey") % 2 === 0)
        else orders0
      val e0 = orders.join(spark.read.parquet(s"$dir/lineitem.parquet"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
        .distinct()
      e0.select((col("c") * 2).as("src"), (col("p") * 2 + 1).as("dst"))
        .union(e0.select((col("p") * 2 + 1).as("src"), (col("c") * 2).as("dst")))
    }

    // warm-up, as Bench
    spark.range(1000000).selectExpr("sum(id * 2)")
      .write.format("noop").mode("overwrite").save()
    edgesOf(half = false).write.format("noop").mode("overwrite").save()

    final case class Arm(name: String, run: () => Unit)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val arms: Seq[Arm] =
      (for {
        half <- Seq(false, true)
        it <- Seq(1, 2, 4, 8)
      } yield Arm(s"full=${!half} iters=$it ee=on", () =>
        noop(graft.operators.Graph.pageRank(edgesOf(half), iters = it)))) ++
      Seq(
        Arm("full=true iters=3 ee=on", () =>
          noop(graft.operators.Graph.pageRank(edgesOf(false), iters = 3))),
        Arm("full=true iters=3 ee=OFF", () =>
          noop(graft.operators.Graph.pageRank(edgesOf(false), iters = 3,
            earlyExit = false))))

    val reps = 5
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (r <- 1 to reps; a <- arms) {
      val t0 = System.nanoTime()
      a.run()
      val dt = (System.nanoTime() - t0) / 1e9
      times(a.name) = times(a.name) :+ dt
      println(f"[rep $r] ${a.name}%-28s $dt%6.2f s")
    }
    println("== medians ==")
    arms.foreach { a =>
      val ts = times(a.name).sorted
      println(f"[probe] ${a.name}%-28s median ${ts(reps / 2)}%6.2f s  " +
        s"reps=${ts.map(t => f"$t%.2f").mkString(", ")}")
    }
    spark.stop()
  }
}
