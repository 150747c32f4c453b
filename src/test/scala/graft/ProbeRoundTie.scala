package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Kernel-level adversarial probe for the `round(double, k)`
  * engine-ambiguity class (SURVEY §30.4): Spark rounds the SHORTEST
  * DECIMAL re-rendering of the double (BigDecimal.valueOf → HALF_UP),
  * DuckDB rounds the BINARY value (multiply by 10^k, round, divide).
  * The two disagree when the rendering sits on (or next to) a scale-k
  * half tie and the binade alignment preserves the sub-half deviation
  * — the class that bit q_time_bucket's avg4 at sf0.001.
  *
  * This probe synthesizes the boundary population directly instead of
  * waiting for a gate run to land on it:
  *   (a) exact half-tie renderings `i.d{k}5` plus their ulp neighbors,
  *   (b) small-integer ratios m/n (the recall / dup_frac / fail_rate
  *       shape — n-gram and doc counts),
  *   (c) decimal-grid averages cents/100/count (the avg-of-money
  *       shape that actually fired).
  * For every value it computes the PURE Spark kernel, VALIDATES it
  * against the real Spark `round()` (any mismatch fails loudly — the
  * pure kernel must BE the engine before its verdicts mean anything),
  * and dumps (k, rendering, spark_round) to CSV for
  * `scripts/probe_round_tie.py`, which replays the identical values
  * through real DuckDB (renderings round-trip bit-exact through any
  * IEEE parser) and prints the firing table.
  */
object ProbeRoundTie {

  /** Spark's round(double, k): round the shortest-decimal rendering
    * HALF_UP (java.math.BigDecimal.valueOf goes through
    * Double.toString). */
  def sparkKernel(x: Double, k: Int): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(k, java.math.RoundingMode.HALF_UP).doubleValue()

  def main(args: Array[String]): Unit = {
    val rng = new scala.util.Random(20260816L)
    val ks = Seq(2, 4, 6)
    val values = scala.collection.mutable.LinkedHashSet[(Int, String, Double)]()
    for (k <- ks) {
      // (a) exact scale-k half-tie renderings + ulp neighbors: the
      // rendering either IS the tie (Spark must round up) or the
      // neighbor renders longer (Spark rounds the long rendering) —
      // both sides of the boundary get probed
      for (_ <- 1 to 4000) {
        val ip = rng.nextInt(10000)
        val frac = (1 until k).map(_ => rng.nextInt(10)).mkString
        val x = s"$ip.$frac${rng.nextInt(10)}5".toDouble
        for (v <- Seq(x, Math.nextUp(x), Math.nextDown(x)))
          values += ((k, "tie", v))
      }
      // (b) ratios of small integers — recall gates, dup fractions,
      // fail rates: m/n lands on terminating-decimal ties whenever n
      // divides a power of 10 times 2 (n = 8, 16, 32, 80, 160, ...)
      for (_ <- 1 to 6000) {
        val n = rng.nextInt(998) + 2
        val m = rng.nextInt(n + 1)
        values += ((k, "ratio", m.toDouble / n))
      }
      // (c) decimal-grid averages: sum-of-cents / count — the exact
      // shape of the avg4 firing (money/quantity grids)
      for (_ <- 1 to 6000) {
        val cents = rng.nextLong(100000000L)
        val cnt = rng.nextInt(999) + 1
        values += ((k, "avg", (cents / 100.0) / cnt))
      }
    }
    // negated mirror of the whole population: HALF_UP at a negative
    // tie rounds AWAY FROM ZERO — correlations, slopes, log-ratios and
    // cosines are signed, so the kernel equivalence must hold on both
    // sides of zero
    values ++= values.toSeq.map { case (k, cls, x) => (k, s"neg_$cls", -x) }
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // validate the pure kernel against the real engine, per scale
    var mismatches = 0L
    for (k <- ks) {
      val vs = values.collect { case (`k`, _, x) => x }.toSeq
      val engine = vs.toDF("x").select(col("x"), round(col("x"), k).as("r"))
        .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      for (x <- vs if engine(x) != sparkKernel(x, k)) {
        mismatches += 1
        println(s"[probe] KERNEL MISMATCH k=$k x=$x engine=${engine(x)} " +
          s"pure=${sparkKernel(x, k)}")
      }
    }
    println(s"[probe] pure-Spark-kernel validation: ${values.size} values, " +
      s"$mismatches mismatches" + (if (mismatches == 0) " (kernel IS the engine)" else ""))
    val out = new java.io.PrintWriter("/tmp/round_tie_spark.csv")
    out.println("k,cls,x,spark_round")
    // Double.toString renderings round-trip exactly through any IEEE
    // parser — the CSV carries the exact bits to the DuckDB side
    values.foreach { case (k, cls, x) =>
      out.println(s"$k,$cls,${x.toString},${sparkKernel(x, k).toString}")
    }
    out.close()
    println(s"[probe] wrote ${values.size} values to /tmp/round_tie_spark.csv" +
      " - run: python3 scripts/probe_round_tie.py")
    spark.stop()
  }
}
