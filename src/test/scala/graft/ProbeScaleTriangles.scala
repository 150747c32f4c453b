package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-slope probe for A66 triangle counting (the ProbeScale
  * pattern): the degree-ordered orientation's promise is wedge volume
  * Σ C(outdeg,2) ≤ m·O(√m), so runtime should grow clearly
  * SUB-quadratically in edges on a fixed node set (naive wedge
  * generation without orientation is Σ C(deg,2) — 4× per edge
  * doubling on a random graph, plus unbounded hub blowup on skewed
  * ones). Two slopes:
  *   - edges at fixed nodes (density growth): the orientation bound's
  *     stress direction;
  *   - nodes and edges proportional (corpus growth at constant
  *     degree): should be near-linear.
  * Plus a skew arm: one hub in 1% of all edges — the case raw wedge
  * enumeration cannot survive — must stay in the same cost band as
  * the uniform graph at equal m.
  * Run: sbt -batch "Test/runMain graft.ProbeScaleTriangles"
  */
object ProbeScaleTriangles {
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

    // hash-derived random graph: m edge slots over n nodes (dedup and
    // self-loop removal happen inside the operator)
    def uniform(n: Long, m: Long) = spark.range(m)
      .select(pmod(hash(col("id"), lit(1)), lit(n)).cast("long").as("src"),
        pmod(hash(col("id"), lit(2)), lit(n)).cast("long").as("dst"))

    // skewed: 1% of edges touch node 0 (the hub a degree-ordered
    // orientation must neutralize)
    def skewed(n: Long, m: Long) = spark.range(m)
      .select(
        when(col("id") % 100 === 0, lit(0L))
          .otherwise(pmod(hash(col("id"), lit(1)), lit(n)).cast("long"))
          .as("src"),
        pmod(hash(col("id"), lit(2)), lit(n)).cast("long").as("dst"))

    for (m <- Seq(250000L, 500000L, 1000000L))
      time(s"edges=$m nodes=20k uniform") {
        noop(graft.operators.Graph.triangles(uniform(20000L, m))) }
    for (n <- Seq(10000L, 20000L, 40000L))
      time(s"nodes=$n edges=${40 * n} proportional") {
        noop(graft.operators.Graph.triangles(uniform(n, 40 * n))) }
    time("edges=1M nodes=20k SKEWED (1% hub)") {
      noop(graft.operators.Graph.triangles(skewed(20000L, 1000000L))) }
    spark.stop()
  }
}
