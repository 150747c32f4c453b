package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-slope probe for the r12 string-keyed IPv6 LPM (the ProbeScale
  * k-replicate pattern: disjoint host spaces per replica so DISTINCT
  * hosts grow with volume — the dimension the plan's cost is ∝ to).
  * Two slopes matter:
  *   - rows at fixed distinct hosts (replicas reuse one host space):
  *     should be near-flat past the base cost — the distinct pass is
  *     the only per-row work, the parse+join volume is host-bounded;
  *   - distinct hosts growing with rows (disjoint spaces): the
  *     linear-in-hosts regime the 100 TB design expects.
  * Run: sbt -batch "Test/runMain graft.ProbeScaleLpm6"
  */
object ProbeScaleLpm6 {
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
    val blocks = graft.queries.ReferenceQueries.lpm6Blocks(spark)

    // synthetic host streams off spark.range: g2/g3 drive the matched
    // specificity mix exactly like the gated fixture; `span` bounds the
    // distinct-host universe, `n` the row count
    def hosts(n: Long, span: Long) = {
      def g(c: String) = lower(hex(col(c) % 256))
      spark.range(n)
        .withColumn("h", pmod(hash(col("id")), lit(span)).cast("long"))
        .withColumn("o2", (col("h") / 65536L).cast("long") % 256)
        .withColumn("o3", (col("h") / 256L) % 256)
        .withColumn("o4", col("h") % 256)
        .withColumn("ip6", concat(lit("2001:db8:"), g("o2"), lit(":"),
          g("o3"), lit("::"), g("o4")))
        .select("ip6")
    }
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Lpm.lpmEnrich6(df, "ip6", blocks, "cidr")
        .groupBy("owner").agg(count(lit(1)).as("n"))

    // fixed distinct universe (64k hosts), rows 1M -> 4M
    for (n <- Seq(1000000L, 2000000L, 4000000L)) {
      val df = hosts(n, 65536L).cache(); df.count()
      time(f"rows=${n / 1000000}%dM hosts=64k")(noop(run(df)))
      df.unpersist()
    }
    // distinct hosts growing 64k -> 1M at fixed 4M rows
    for (span <- Seq(262144L, 1048576L)) {
      val df = hosts(4000000L, span).cache(); df.count()
      time(f"rows=4M hosts=${span / 1024}%dk")(noop(run(df)))
      df.unpersist()
    }
    spark.stop()
  }
}
