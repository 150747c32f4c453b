package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.RankSelect

/** Scale probe for [[RankSelect.globalRowNumber]] (the r15 rewire of
  * q_dsir_select's exact top-k cut): the window form
  * `row_number().over(Window.orderBy(score desc, id))` funnels the
  * WHOLE corpus through one task (Exchange SinglePartition + sort on
  * one thread, 31 cores idle); the bucket-offset device keeps every
  * core busy and sorts ~n/1024-row buckets. At the sf0.1 gate the
  * device reads a FIXED-STAGE premium (ProbeR15Entries: 1.60 s vs the
  * window's 1.39 committed) — this probe measures where that inverts.
  *
  * Arms interleaved within one JVM per rep (box-noise discipline),
  * identical localCheckpoint'ed input per size, n=3, median. Both
  * forms must produce the IDENTICAL rank permutation — asserted via a
  * full rank-weighted checksum per size.
  *
  * Run: sbt -batch "Test/runMain graft.ProbeScaleGlobalRank"
  * Numbers land in SURVEY §28 next to the ProbeR15Entries table.
  */
object ProbeScaleGlobalRank {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def corpus(n: Long): DataFrame =
      spark.range(n).select(col("id"),
        // hash-spread scores with planted ties (mod keeps multiplicity
        // ~16 per score at every size - ties exercise the tiebreak)
        pmod(xxhash64(col("id")), lit(n / 16 + 1)).as("score"))
        .localCheckpoint(true)

    def checksum(df: DataFrame): Long =
      // xor of the (rk, id) pair hash: order-free, overflow-free, and
      // any permutation difference flips it
      df.agg(expr("bit_xor(xxhash64(rk, id))")).head().getLong(0)

    def windowForm(df: DataFrame): DataFrame =
      df.withColumn("rk", row_number()
        .over(Window.orderBy(col("score").desc, col("id"))).cast("long"))

    def bucketForm(df: DataFrame): DataFrame =
      RankSelect.globalRowNumber(df, "score", "rk",
        descending = true, tieBreak = Seq("id"))

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val cs = f
      ((System.nanoTime() - t0) / 1e9, cs)
    }

    // warm-up
    spark.range(1000000).selectExpr("sum(id * 2)")
      .write.format("noop").mode("overwrite").save()

    for (n <- Seq(2000000L, 8000000L, 32000000L)) {
      val df = corpus(n)
      df.count()
      val (wT, bT) = (Array.newBuilder[Double], Array.newBuilder[Double])
      var (wCs, bCs) = (0L, 0L)
      for (rep <- 1 to 3) {
        val (tw, cw) = time(checksum(windowForm(df)))
        val (tb, cb) = time(checksum(bucketForm(df)))
        wT += tw; bT += tb; wCs = cw; bCs = cb
        println(f"[rep $rep] n=$n%-9d window $tw%6.2f s   bucket $tb%6.2f s")
      }
      assert(wCs == bCs, s"rank permutations diverged at n=$n: $wCs != $bCs")
      val (wm, bm) = (wT.result().sorted.apply(1), bT.result().sorted.apply(1))
      println(f"[probe] n=$n%-9d window $wm%6.2f s   bucket $bm%6.2f s   " +
        f"(checksums equal)")
      df.unpersist(true)
    }
    spark.stop()
  }
}
