package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-slope probe for the round-10 operators (the ProbeScale
  * pattern: k-replicate the sf0.1 input with disjoint key spaces so
  * group counts grow with volume, then read the wall-clock slope).
  * Run: sbt -batch "Test/runMain graft.ProbeScaleR10"
  */
object ProbeScaleR10 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[probe] $name median ${ts.sorted.apply(1)}%.2f s (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    val dir = "/root/testdata/sf0.1"
    val ev = graft.sources.Tables.load(spark, dir, "events")
    def evK(k: Int) = (0 until k).map(i => ev
      .withColumn("user_id", col("user_id") + lit(i * 1000000L))
      .withColumn("event_type", concat(col("event_type"), lit(s"#$i"))))
      .reduce(_ union _)

    for (k <- Seq(1, 2, 4)) {
      val e = evK(k).cache()
      e.count()
      time(s"hopping   k=$k")(noop(graft.operators.Hopping.hopAgg(
        e, "ts", "event_type", "value", 3600L, 900L)))
      time(s"interp    k=$k")(noop(graft.operators.Resample.interpolate(
        e, "event_type", "ts", "value", 900L)))
      time(s"heavychg  k=$k")(noop(graft.operators.Changepoint.heavyChange(
        e.withColumn("host", graft.queries.Shared.hostOf(col("user_id"))),
        "host", "ts", 86400L, 20)))
      e.unpersist()
    }

    // pagerank slope: k-replicated DISJOINT purchase graphs (node ids
    // offset per replica) — volume grows, diameter does not
    val o = graft.sources.Tables.load(spark, dir, "orders")
    val l = graft.sources.Tables.load(spark, dir, "lineitem")
    val e0 = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p")).distinct()
    def edgesK(k: Int) = (0 until k).map { i =>
      val off = i * 10000000L
      e0.select((col("c") * 2 + off).as("src"), (col("p") * 2 + 1 + off).as("dst"))
        .union(e0.select((col("p") * 2 + 1 + off).as("src"), (col("c") * 2 + off).as("dst")))
    }.reduce(_ union _)
    for (k <- Seq(1, 2, 4)) {
      val ed = edgesK(k).cache(); ed.count()
      time(s"pagerank  k=$k")(noop(graft.operators.Graph.pageRank(ed, 3)))
      ed.unpersist()
    }
    spark.stop()
  }
}
