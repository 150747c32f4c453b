package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Baseline

/** The rank-kernel crossover probe the knob's GIANT-GROUP claim rests
  * on (the ProbeScale pattern): ONE group holding every row — the
  * regime `graft.rankKernel=bucket` exists for. ProbeSkew measures a
  * hot-/24 distribution (bucket first wins MAD at a 17M-row hot
  * group); this probe isolates the mechanism to its purest form: a
  * single key, so the window kernel's `row_number().over(partitionBy
  * (g).orderBy(v))` shuffles EVERY row into one task and sorts it on
  * one thread while 31 cores idle, whereas the bucket kernel's
  * histogram + offset arithmetic keeps all 32 busy and sorts only the
  * ~n/1024-row target bucket. Expectation: window degrades with the
  * one-task sort (superlinear wall-clock in n at fixed parallelism),
  * bucket stays near-flat per row — the crossover must be decisive,
  * not marginal, or the knob is dead weight.
  *
  * Values are hash-derived (distinct-ish — a constant multiset would
  * let the sort's equal-key fast path cheat); the synthesized frame is
  * localCheckpoint'ed so both kernels re-read identical materialized
  * blocks (the bucket kernel scans its input three times, as it would
  * scan parquet). Both kernels must select the IDENTICAL element —
  * asserted per size.
  *
  * Run: sbt -batch "Test/runMain graft.ProbeScaleRankSelect"
  * Numbers land in SURVEY.md §15 next to the ProbeSkew table.
  */
object ProbeScaleRankSelect {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      val med = ts.sorted.apply(1)
      println(f"[probe] $name median $med%.2f s (${ts.map(t => f"$t%.2f").mkString(", ")})")
      med
    }
    def withKernel[A](k: String)(build: => A): A = {
      spark.conf.set(Baseline.RankKernelKey, k)
      try build finally spark.conf.unset(Baseline.RankKernelKey)
    }

    for (n <- Seq(5000000L, 20000000L, 50000000L)) {
      // one giant group: every row keyed "g", value a 32-bit hash
      val giant = spark.range(n)
        .select(lit("g").as("k"),
          hash(col("id"), lit(7)).cast("long").as("v"))
        .localCheckpoint(eager = true)
      val times = Seq("window", "bucket").map { k =>
        k -> time(s"p95 giant-group n=$n $k")(withKernel(k)(
          noop(Baseline.rankSelect(giant, "k", "v", num = 19, den = 20))))
      }.toMap
      val sel = Seq("window", "bucket").map { k =>
        withKernel(k)(Baseline.rankSelect(giant, "k", "v", 19, 20)
          .collect().toSeq)
      }
      assert(sel(0) == sel(1), s"kernels disagree at n=$n")
      println(f"[probe] n=$n agree sel=${sel(0).head.get(2)} " +
        f"speedup window/bucket = ${times("window") / times("bucket")}%.2f x")
      giant.unpersist()
    }
    spark.stop()
  }
}
