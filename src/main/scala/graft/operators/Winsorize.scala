package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A68: per-group winsorized robust statistics (SURVEY.md §2.2) — the
  * outlier-capping pass every metrics/feature pipeline runs before a
  * mean/stddev is trustworthy: clamp each value into its group's
  * [p_lo, p_hi] percentile band, count what was clipped (the honesty
  * meter — a silent clamp hides data problems), and report the
  * clamped moments.
  *
  * Percentiles are DISCRETE (the value at position ⌈p·n⌉ of the
  * group's sort order), not interpolated: the value AT a position is
  * well-defined on both engines regardless of tie permutation,
  * whereas interpolated percentiles produce engine-ambiguous halfway
  * doubles. All accumulation is integer (caller quantizes values to
  * an integer ladder): clamped sums in long, squared sums in
  * decimal(38,0), so mean/std leave integers only in one final fixed
  * IEEE expression per group — identical cross-engine (the
  * [[Autocorr]] discipline).
  *
  * Scale shape: ONE shuffle — the group sort window (row_number, the
  * same per-key sort class as the A19 window suite) and the
  * threshold broadcast-within-partition (an unbounded-frame
  * conditional max over the SAME partitioning, so it adds no
  * exchange) feed one grouped aggregation. No join back: the
  * threshold row is selected by position inside the pass. At 100 TB
  * the exact sort is the gate form; production swaps the thresholds
  * for approx_percentile and keeps everything downstream identical
  * (the documented exact-vs-approx split shared with DSIR's rank
  * cut).
  */
object Winsorize {

  /** Winsorized per-group stats. `v` must be integral (quantize
    * first). `pLoPermille`/`pHiPermille` in [1, 1000], lo < hi.
    * Returns one row per group: (key, n, lo, hi, n_clip_lo,
    * n_clip_hi, mean_w, std_w) — lo/hi the discrete percentile
    * values on the input ladder, mean_w/std_w the clamped population
    * moments (constant groups get std_w = 0.0).
    */
  def stats(df: DataFrame, keyCol: String, vCol: String,
      pLoPermille: Int = 50, pHiPermille: Int = 950): DataFrame = {
    require(pLoPermille >= 1 && pHiPermille <= 1000 &&
      pLoPermille < pHiPermille,
      s"bad permille band [$pLoPermille, $pHiPermille]")
    val sortW = Window.partitionBy(col("key")).orderBy(col("v"))
    val grpW = Window.partitionBy(col("key"))
    val d38 = "decimal(38,0)"
    // ceil(p·n/1000) as pure integer arithmetic, clamped to [1, n]
    def idx(p: Int) =
      least(greatest(expr(s"(n * $p + 999) div 1000"), lit(1L)), col("n"))
    val ranked = df
      .select(col(keyCol).as("key"), col(vCol).cast("long").as("v"))
      .withColumn("rn", row_number().over(sortW))
      .withColumn("n", count(lit(1)).over(grpW))
      .withColumn("lo",
        max(when(col("rn") === idx(pLoPermille), col("v"))).over(grpW))
      .withColumn("hi",
        max(when(col("rn") === idx(pHiPermille), col("v"))).over(grpW))
      .withColumn("w", least(greatest(col("v"), col("lo")), col("hi")))
    ranked
      .groupBy(col("key"))
      .agg(
        max(col("n")).as("n"),
        max(col("lo")).as("lo"),
        max(col("hi")).as("hi"),
        sum(when(col("v") < col("lo"), 1L).otherwise(0L)).as("n_clip_lo"),
        sum(when(col("v") > col("hi"), 1L).otherwise(0L)).as("n_clip_hi"),
        sum(col("w").cast(d38)).as("__sw"),
        sum((col("w").cast(d38)) * col("w").cast(d38)).as("__sww"),
        count(lit(1)).cast(d38).as("__cn"))
      .select(col("key"), col("n"), col("lo"), col("hi"),
        col("n_clip_lo"), col("n_clip_hi"),
        round((col("__sw").cast("double")) / col("__cn").cast("double"), 6)
          .as("mean_w"),
        round(sqrt(
            (col("__cn") * col("__sww") - col("__sw") * col("__sw"))
              .cast("double")) /
          col("__cn").cast("double"), 6).as("std_w"))
  }
}
