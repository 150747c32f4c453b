package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization over a stream — the continuous counterpart
  * of the batch lag+cumsum query (AnalyticsQueries.qSessionize), built
  * on flatMapGroupsWithState: per-user state is one open session
  * (count/sum/bounds), sessions close when the event-time gap exceeds
  * the threshold or the user goes idle past the watermark (state
  * timeout -> no unbounded state).
  */
object StreamingSessionize {

  final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)

  final case class OpenSession(
      startUs: Long, endUs: Long, nEvents: Long, sumValue: Double)

  final case class ClosedSession(
      user_id: Long,
      start_us: Long,
      end_us: Long,
      n_events: Long,
      sum_value: Double)

  /** events (streaming, watermarked by caller or here) -> closed
    * sessions. `gapSeconds` is the inactivity gap that splits
    * sessions.
    */
  def sessions(events: DataFrame, gapSeconds: Long,
      watermarkDelay: String): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L

    def update(
        userId: Long,
        rows: Iterator[SessionEvent],
        state: GroupState[OpenSession]): Iterator[ClosedSession] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(ClosedSession(userId, s.startUs, s.endUs, s.nEvents, s.sumValue))
      } else {
        val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.value))
        var open = state.getOption
        val closed = Seq.newBuilder[ClosedSession]
        sorted.foreach { e =>
          val us = e.ts.getTime * 1000L
          open match {
            case Some(s) if us - s.endUs <= gapUs =>
              // startUs can move DOWN: an out-of-order event (still
              // inside the watermark) may predate the open session.
              open = Some(s.copy(startUs = math.min(s.startUs, us),
                endUs = math.max(s.endUs, us),
                nEvents = s.nEvents + 1, sumValue = s.sumValue + e.value))
            case Some(s) =>
              closed += ClosedSession(userId, s.startUs, s.endUs, s.nEvents, s.sumValue)
              open = Some(OpenSession(us, us, 1L, e.value))
            case None =>
              open = Some(OpenSession(us, us, 1L, e.value))
          }
        }
        open.foreach { s =>
          state.update(s)
          // close the session once the watermark passes end + gap
          state.setTimeoutTimestamp(s.endUs / 1000L + gapSeconds * 1000L)
        }
        closed.result().iterator
      }
    }

    events
      .withWatermark("ts", watermarkDelay)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
