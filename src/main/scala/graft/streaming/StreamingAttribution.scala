package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of first/last-touch conversion attribution
  * (graft.operators.Attribution.touchAttribution, A54): attribution is
  * decided AT CONVERSION TIME from a per-user buffer of recent channel
  * touches — the shape a live marketing/alerting pipeline needs, where
  * the batch operator's join-then-aggregate would wait for the day's
  * close.
  *
  * State per user: the channel touches inside the trailing lookback of
  * the newest event seen — bounded by touch-rate x lookback, pruned
  * every batch (a user's state never grows with stream age). Rows are
  * processed in (ts, event_id) order within each micro-batch, so
  * in-order replay reproduces the batch operator row-for-row
  * (spec-pinned); a touch arriving AFTER a later conversion was
  * processed (cross-batch out-of-order) is missed for that conversion
  * — run behind a watermark sized to the acceptable lag, the same
  * contract family as the other streaming twins.
  *
  * Emits one append-style row per conversion with the batch columns:
  * (conv_event_id, user_id, conv_us, n_touches, first/last touch type
  * and event id, 'direct' when no touch is in window).
  */
object StreamingAttribution {

  final case class Ev(user_id: Long, us: Long, ty: String, event_id: Long)

  final case class Attributed(conv_event_id: Long, user_id: Long,
      conv_us: Long, n_touches: Long,
      first_touch: String, first_event_id: Option[Long],
      last_touch: String, last_event_id: Option[Long])

  /** Derive the typed event stream from a raw events frame with the
    * same expressions the batch query uses.
    */
  def events(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String): Dataset[Ev] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(userCol).as("user_id"),
        unix_micros(col(tsCol)).as("us"),
        col(typeCol).as("ty"), col(idCol).as("event_id"))
      .as[Ev]
  }

  def perUser(evs: Dataset[Ev], convType: String,
      channelTypes: Set[String], lookbackSeconds: Long): Dataset[Attributed] = {
    val spark = evs.sparkSession
    import spark.implicits._
    val lookUs = lookbackSeconds * 1000000L

    // state: (newest us seen, touches as (us, event_id, ty) within
    // lookback of it)
    def update(user: Long, rows: Iterator[Ev],
        state: GroupState[(Long, List[(Long, Long, String)])])
        : Iterator[Attributed] = {
      var (maxUs, buf) = state.getOption.getOrElse((Long.MinValue, Nil))
      val out = scala.collection.mutable.ArrayBuffer.empty[Attributed]
      rows.toSeq.sortBy(e => (e.us, e.event_id)).foreach { e =>
        if (e.us > maxUs) maxUs = e.us
        // INDEPENDENT branches, not if/else: the batch operator lets
        // an event type sit in both roles (a conversion can attribute
        // to a PRIOR conversion when convType ∈ channelTypes), and the
        // strict t_us < conv_us window keeps self-attribution out
        // either way
        if (channelTypes.contains(e.ty))
          buf = (e.us, e.event_id, e.ty) :: buf
        if (e.ty == convType) {
          val win = buf.filter(t => t._1 >= e.us - lookUs && t._1 < e.us)
          if (win.isEmpty)
            out += Attributed(e.event_id, user, e.us, 0L,
              "direct", None, "direct", None)
          else {
            val first = win.minBy(t => (t._1, t._2))
            val last = win.maxBy(t => (t._1, t._2))
            out += Attributed(e.event_id, user, e.us, win.size.toLong,
              first._3, Some(first._2), last._3, Some(last._2))
          }
        }
      }
      // prune to the trailing lookback of the newest event
      state.update((maxUs, buf.filter(_._1 >= maxUs - lookUs)))
      out.iterator
    }

    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
  }
}
