package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A26as: streaming cohort retention — the live twin of the A26a
  * batch table (first-activity-week cohorts × week-offset user
  * counts). The batch computation is a per-user DISTINCT-WEEK SET
  * with cohort = min week — order-independent by construction — so
  * unlike the chain-shaped twins (funnel, SCD2) this one is EXACT
  * under ANY arrival order within its horizon, with THREE LONGS of
  * state per user forever:
  *
  *   - `cohort`: the user's earliest week index seen so far
  *     (Monday-start, the `date_trunc("week")` convention);
  *   - `mask`: bit k set = active in cohort week + k, k in 0..63 — a
  *     64-week (~15-month) exact retention horizon;
  *   - `n_lost`: the honesty meter. An event landing PAST the horizon
  *     can't be deduplicated with bounded state, and a cohort
  *     RE-BASING (an out-of-order event EARLIER than the current
  *     cohort shifts every offset up — the closed-form origin shift,
  *     the StreamingTrend discipline: `mask << d | 1`) can push high
  *     bits out; both tick the meter instead of silently truncating.
  *     A user row with n_lost = 0 is exact, period.
  *
  * Each micro-batch emits the user's refreshed (cohort, mask, meter)
  * row (Update mode); the retention table is one downstream explode of
  * the mask bits over the latest emit per user — counts per
  * (cohort_week, week_k), the batch report.
  */
object StreamingRetention extends Serializable {

  final case class ActivityEvent(user_id: Long, tsUs: Long)

  final case class UserRetention(user_id: Long, cohort_week_us: Long,
      week_mask: Long, n_lost: Long)

  /** Monday-start week index of an epoch-micros timestamp (day 0 =
    * 1970-01-01 was a Thursday, so Monday-aligned weeks are
    * floor((day + 3) / 7) — matches `date_trunc("week")` in a UTC
    * session).
    */
  private[streaming] def weekIdx(tsUs: Long): Long =
    Math.floorDiv(Math.floorDiv(tsUs, 86400000000L) + 3, 7)

  private[streaming] def weekStartUs(weekIdx: Long): Long =
    (weekIdx * 7 - 3) * 86400000000L

  def perUser(events: Dataset[ActivityEvent]): Dataset[UserRetention] = {
    val spark = events.sparkSession
    import spark.implicits._

    def update(uid: Long, rows: Iterator[ActivityEvent],
        state: GroupState[(Long, Long, Long)]): Iterator[UserRetention] = {
      var (cohort, mask, lost) =
        state.getOption.getOrElse((Long.MaxValue, 0L, 0L))
      rows.foreach { e =>
        val w = weekIdx(e.tsUs)
        if (cohort == Long.MaxValue) { cohort = w; mask = 1L }
        else if (w >= cohort) {
          val k = w - cohort
          if (k < 64) mask |= 1L << k
          else lost += 1
        } else {
          val d = cohort - w
          if (d >= 64) {
            // every tracked week leaves the horizon: count the distinct
            // weeks lost, restart the mask at the new (earlier) cohort
            lost += java.lang.Long.bitCount(mask)
            mask = 1L
          } else {
            lost += java.lang.Long.bitCount(mask >>> (64 - d))
            mask = (mask << d) | 1L
          }
          cohort = w
        }
      }
      state.update((cohort, mask, lost))
      Iterator.single(
        UserRetention(uid, weekStartUs(cohort), mask, lost))
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
  }
}
