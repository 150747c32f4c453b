package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A60: hopping (sliding) window aggregation — overlapping time
  * windows of `sizeSeconds` advancing every `slideSeconds` (a tumbling
  * window is the slide == size special case, A5). The monitoring shape
  * the trailing-window baselines (R3) answer point-in-time: "the last
  * hour's rate, refreshed every 15 minutes", as one declarative
  * aggregation over ALL window positions at once.
  *
  * Spark-first: the built-in `window(ts, size, slide)` generator — each
  * row expands to its size/slide covering windows INSIDE the plan
  * (a codegen'd expand, no self-join, no per-window requery), then one
  * partial-aggregated shuffle on (window, key). The expansion factor
  * is size/slide (bounded, chosen by the caller), so input amplifation
  * is explicit and constant — at 100 TB the shuffle carries
  * size/slide × the tumbling-window volume, all map-side combined
  * first.
  *
  * Float discipline: the value sum goes through decimal(28,10) before
  * the round-2 double cast (the [[graft.queries.Shared.sum2]] device)
  * so partition order cannot move the result by an ulp.
  *
  * Windows are epoch-aligned (Spark's default origin): window start =
  * the largest multiple of slide at or below ts - size + slide, and
  * every event lands in EXACTLY size/slide windows for ts >= epoch.
  * `sizeSeconds` must be a multiple of `slideSeconds` — a non-divisor
  * slide makes per-event coverage vary by phase, which is almost never
  * the intended monitoring semantics.
  */
object Hopping {

  def hopAgg(df: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, sizeSeconds: Long, slideSeconds: Long): DataFrame = {
    require(slideSeconds > 0 && sizeSeconds > 0,
      s"want positive size/slide, got $sizeSeconds/$slideSeconds")
    require(sizeSeconds % slideSeconds == 0,
      s"sizeSeconds=$sizeSeconds must be a multiple of slideSeconds=$slideSeconds")
    df.groupBy(
        window(col(tsCol), s"$sizeSeconds seconds", s"$slideSeconds seconds")
          .as("w"),
        col(keyCol))
      .agg(count(lit(1)).as("n"),
        // the decimal-exact sum device, inlined rather than imported
        // from graft.queries.Shared — operators never depend on the
        // query layer (same arithmetic as Shared.sum2 / sum2Sql)
        round(sum(col(valueCol).cast("decimal(28,10)")), 2)
          .cast("double").as("sum_value"))
      .select(col("w.start").as("ws"), col("w.end").as("we"),
        col(keyCol), col("n"), col("sum_value"))
  }
}
