package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A57s: streaming rank-movement trending — the live twin of the
  * per-day event-type leaderboard (`AnalyticsQueries.qTrending`).
  *
  * Split the batch query at its natural seam (the R27s convention:
  * stateful counting in the stream, ranking downstream over the
  * latest emit per key):
  *
  *   - [[counts]] (stateful): ONE LONG of state per (day, event_type)
  *     — the running count, re-emitted on every touched micro-batch
  *     (Update mode). Counts are order-independent, so late events
  *     fold EXACTLY at any depth while the day's state lives; keying
  *     by (day, type) also distributes a single hot day across the
  *     full type domain instead of funneling it through one task —
  *     the shape that survives a 100 TB/day stream. Production
  *     expires closed days with a processing-time timeout
  *     (`GroupStateTimeout.ProcessingTimeTimeout`) once a day is past
  *     its late-arrival horizon; the operator itself never needs a
  *     watermark because count state is a commutative monoid.
  *   - [[leaderboard]] (stateless): the batch query's tail verbatim —
  *     deterministic rank via (n_events DESC, event_type) and the
  *     day+1 self-join for the movement delta — applied to the
  *     compacted counts snapshot (latest emit per (day, type), e.g. a
  *     foreachBatch-maintained view). Running it downstream instead
  *     of inside the state function keeps ranks consistent across ALL
  *     keys, including days untouched by the current micro-batch.
  *
  * The spec pins replay == batch under arbitrary micro-batch splits,
  * late cross-batch events included, and end-to-end leaderboard
  * equality against the batch rank/join computed on the same events.
  */
object StreamingTrending {

  /** `day` is epoch days (what `DateType` stores physically). */
  final case class DayTypeEvent(day: Int, eventType: String)

  final case class DayTypeCount(day: Int, event_type: String, n_events: Long)

  def counts(events: Dataset[DayTypeEvent]): Dataset[DayTypeCount] = {
    val spark = events.sparkSession
    import spark.implicits._

    def update(key: (Int, String), rows: Iterator[DayTypeEvent],
        state: GroupState[Long]): Iterator[DayTypeCount] = {
      var n = state.getOption.getOrElse(0L)
      rows.foreach(_ => n += 1L)
      state.update(n)
      Iterator.single(DayTypeCount(key._1, key._2, n))
    }

    events.groupByKey(e => (e.day, e.eventType))
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
  }

  /** Column-name adapter from a raw (timestamp, type) frame. */
  def counts(df: DataFrame, tsCol: String, typeCol: String)
      : Dataset[DayTypeCount] = {
    val spark = df.sparkSession
    import spark.implicits._
    counts(df.select(
      datediff(date_trunc("day", col(tsCol)).cast("date"),
        lit("1970-01-01").cast("date")).as("day"),
      col(typeCol).cast("string").as("eventType")).as[DayTypeEvent])
  }

  /** The batch trending tail over a compacted counts snapshot
    * (columns day, event_type, n_events; one row per (day, type)):
    * per-day rank by (n_events DESC, event_type), previous-day rank
    * via a day+1 self-join, movement delta. Identical plan to the
    * second half of `qTrending` — per-day ranks touch only the
    * day-partitioned window and the join broadcasts nothing bigger
    * than the snapshot itself (days x |type domain| rows, config-
    * sized relative to the event stream).
    */
  def leaderboard(snapshot: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("day"))
      .orderBy(col("n_events").desc, col("event_type"))
    val ranked = snapshot.withColumn("rnk", row_number().over(w))
    ranked.join(
        ranked.select((col("day") + 1).as("day"), col("event_type"),
          col("rnk").as("prev_rnk")),
        Seq("day", "event_type"), "left")
      .withColumn("rank_delta", col("prev_rnk") - col("rnk"))
      .orderBy("day", "rnk")
  }
}
