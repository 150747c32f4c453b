package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A62: grid resampling with LINEAR interpolation — the companion of
  * forward-fill (A52, step interpolation) for series where the value
  * moves between observations: each key's irregular (ts, value)
  * observations become values at regular `stepSeconds` ticks spanning
  * [first obs, last obs], every tick interpolated between its
  * bracketing observations.
  *
  * Exact integer arithmetic end to end: values in micro-units, the
  * interpolated value as the WEIGHTED-AVERAGE form
  *
  *   (prev·(next_t − t) + next·(t − prev_t)) div (next_t − prev_t)
  *
  * — every term non-negative, so truncating and flooring division
  * agree and both engines compute the identical bit pattern (the
  * naive `prev + Δ·frac` form has a negative numerator whenever the
  * series falls, where Spark's `div` truncates toward zero but SQL
  * floor-division rounds down — a one-unit cross-engine divergence).
  * Products run in decimal(38,0): micro-value × micro-timestamp-gap
  * exceeds 2^63 for day-scale gaps, and a long multiply would wrap
  * silently. Negative input values RAISE (the non-negative invariant
  * is what makes trunc == floor; callers with signed series shift
  * their origin first).
  *
  * Shape: one (key, ts) pre-aggregation, per-key bounds, tick
  * explosion bounded by span/step, one union + two windows partitioned
  * by key — sorts distribute across the key universe; nothing global.
  */
object Resample {

  def interpolate(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds=$stepSeconds (want > 0)")
    val stepUs = stepSeconds * 1000000L
    val obs = df
      .select(col(keyCol).as("key"),
        unix_micros(col(tsCol)).as("us"),
        round(col(valueCol) * lit(1000000)).cast("bigint").as("__vm"))
      .groupBy("key", "us")
      // same-instant duplicates resolve to the minimum (deterministic)
      .agg(min(col("__vm")).as("__vm"))
      .withColumn("vm",
        when(col("__vm") < 0, raise_error(lit(
          "Resample.interpolate: negative value — shift the series " +
            "origin first (non-negativity is the trunc==floor invariant)")))
          .otherwise(col("__vm")))
      .select("key", "us", "vm")
    // floor division via pmod (exact for NEGATIVE micros too — a
    // pre-1970 series under truncating `div` grew a ghost tick past
    // its last observation, the r10 review finding); integer ceil =
    // floor(x + step − 1) holds for any sign with a true floor
    def floorDiv(x: String): String =
      s"(($x) - pmod($x, $stepUs)) div $stepUs"
    val grid = obs.groupBy("key")
      .agg(min("us").as("lo"), max("us").as("hi"))
      .select(col("key"),
        expr(floorDiv(s"lo + ${stepUs - 1}")).as("t0"),
        expr(floorDiv("hi")).as("t1"))
      // Spark's sequence(a, b) DESCENDS when a > b — a span shorter
      // than one tick must yield no rows, not a reversed ghost tick
      .filter(col("t0") <= col("t1"))
      .select(col("key"),
        explode(expr("sequence(t0, t1)")).as("__t"))
      .select(col("key"), (col("__t") * stepUs).as("us"))
    val u = obs.select(col("key"), col("us"), col("vm"),
        lit(0).as("is_grid"))
      .unionByName(grid.select(col("key"), col("us"),
        lit(null).cast("long").as("vm"), lit(1).as("is_grid")))
    // prev: observations sort BEFORE a coincident tick; next:
    // observations sort AFTER it (reversed tie order) — an exact-hit
    // tick sees itself on both sides and the equal-bounds case below
    // returns the observation verbatim.
    //
    // BOTH directions run as RUNNING frames (unboundedPreceding ..
    // currentRow), the "next" one over the reversed (us DESC) ordering:
    // Spark evaluates a running frame in O(n) per partition, but a
    // (currentRow .. unboundedFollowing) frame re-aggregates from every
    // row to the partition end — O(n²), measured 85 s vs 0.3 s on a
    // 23k-row partition at sf0.1. `last` over the reverse order is
    // semantically identical to `first` over the forward suffix.
    val wPrev = Window.partitionBy("key")
      .orderBy(col("us"), col("is_grid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy("key")
      .orderBy(col("us").desc, col("is_grid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val obsUs = when(col("vm").isNotNull, col("us"))
    u.withColumn("pvm", last(col("vm"), ignoreNulls = true).over(wPrev))
      .withColumn("pus", last(obsUs, ignoreNulls = true).over(wPrev))
      .withColumn("nvm", last(col("vm"), ignoreNulls = true).over(wNext))
      .withColumn("nus", last(obsUs, ignoreNulls = true).over(wNext))
      .filter(col("is_grid") === 1)
      .withColumn("interp_micros",
        when(col("nus") === col("pus"), col("pvm"))
          .otherwise(expr(
            """cast((cast(pvm as decimal(38,0)) * (nus - us)
              |  + cast(nvm as decimal(38,0)) * (us - pus))
              |  div (nus - pus) as bigint)""".stripMargin)))
      .select(col("key"), expr("timestamp_micros(us)").as("ts"),
        col("interp_micros"),
        round(col("interp_micros") / 1000000.0, 6).as("value"))
  }
}
