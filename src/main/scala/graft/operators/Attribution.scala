package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A54: conversion attribution (SURVEY.md §2.2) — for every conversion
  * event, the first-touch and last-touch channel event of the same
  * user within a lookback window, plus the touch count. The analytics
  * counterpart of the funnel (A27): the funnel asks "did the sequence
  * complete", attribution asks "which touch gets the credit".
  *
  * Shape: conversions equi-join touches on the user key with the
  * lookback as a range predicate (the interval-join class, A23a), then
  * ONE aggregation per conversion — first/last resolve as min/max over
  * a (ts, event_id, type) struct, which is a total lexicographic order
  * (ids are unique), so credit assignment is deterministic in every
  * engine with no window sort anywhere. Conversions with no touch in
  * the window attribute to 'direct'.
  *
  * Scale shape: shuffle on user_id only; per-conversion fanout is
  * bounded by the user's event rate times the lookback (enforce with
  * an upstream per-user cap for adversarial actors); partial-agg
  * combines the min/max structs map-side.
  */
object Attribution {

  def touchAttribution(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String, convType: String,
      channelTypes: Seq[String], lookbackSeconds: Long): DataFrame = {
    require(lookbackSeconds > 0, s"invalid lookback=$lookbackSeconds")
    val base = events.select(col(userCol).as("user_id"),
      unix_micros(col(tsCol)).as("us"),
      col(typeCol).as("ty"), col(idCol).as("event_id"))
    val conv = base.filter(col("ty") === convType)
      .select(col("user_id"), col("us").as("conv_us"),
        col("event_id").as("conv_event_id"))
    val touch = base.filter(col("ty").isin(channelTypes: _*))
      .select(col("user_id"), col("us").as("t_us"),
        col("ty").as("t_ty"), col("event_id").as("t_id"))
    val joined = conv.join(touch, Seq("user_id"))
      .filter(col("t_us") >= col("conv_us") - lit(lookbackSeconds * 1000000L) &&
        col("t_us") < col("conv_us"))
    val agg = joined.groupBy("user_id", "conv_event_id", "conv_us").agg(
      count(lit(1)).as("n_touches"),
      min(struct(col("t_us"), col("t_id"), col("t_ty"))).as("__f"),
      max(struct(col("t_us"), col("t_id"), col("t_ty"))).as("__l"))
    conv.join(agg, Seq("user_id", "conv_event_id", "conv_us"), "left")
      .select(col("conv_event_id"), col("user_id"), col("conv_us"),
        coalesce(col("n_touches"), lit(0L)).as("n_touches"),
        coalesce(col("__f.t_ty"), lit("direct")).as("first_touch"),
        col("__f.t_id").as("first_event_id"),
        coalesce(col("__l.t_ty"), lit("direct")).as("last_touch"),
        col("__l.t_id").as("last_event_id"))
  }
}
