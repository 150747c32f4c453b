package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A65s: streaming SCD2 — validity intervals emitted LIVE: when a
  * key's tracked value changes, the closing interval
  * `[valid_from, valid_to)` appends downstream immediately (the batch
  * [[graft.operators.Cdc.scd2]] row it would eventually compute),
  * and the new state opens. Append-friendly by construction: only
  * CLOSED intervals emit — the open interval is exactly the per-key
  * state (one (value, from, late) triple forever, bounded by the key
  * universe), and a consumer wanting it reads the state-store-shaped
  * "current" table from the latest emit per key + its own knowledge
  * that the newest value is open.
  *
  * No-op repeats (same value) collapse without emitting — the batch
  * change-filter semantics. NULL values are real states (Option
  * equality, not a wildcard). Out-of-order rows are COUNTED AND
  * EXCLUDED (`n_late` rides on every emitted row): lateness is judged
  * against the MAX (ts, tie) the key has ever observed — not the open
  * interval's start, which no-op repeats collapse into without
  * advancing, so an event between the open start and a later
  * already-seen observation is late too. Interval history admits no
  * order-free late merge — a late state change would have to split an
  * already-emitted interval — so the meter surfaces watermark
  * violations instead of silently rewriting history.
  *
  * CHECKPOINT COMPATIBILITY: the per-key state tuple widened from 3 to
  * 5 elements (r11, adding the (max ts, max tie) seen-watermark), which
  * changes the state-store row encoding — a streaming query restored
  * from a checkpoint written by the 3-element version will fail or
  * misdecode state. Discard pre-r11 StreamingScd2 checkpoints (or
  * replay the source from scratch); any future widening needs the same
  * call-out or an explicit state-version field.
  */
object StreamingScd2 {

  final case class ScdEvent(key: String, tsUs: Long, tie: Long,
      value: Option[String])

  final case class ClosedInterval(key: String, value: Option[String],
      valid_from_us: Long, valid_to_us: Long, n_late: Long)

  def intervals(stream: Dataset[ScdEvent]): Dataset[ClosedInterval] = {
    val spark = stream.sparkSession
    import spark.implicits._

    // state = (open value, open from, n_late, max ts seen, max tie seen)
    def update(key: String, rows: Iterator[ScdEvent],
        state: GroupState[(Option[String], Long, Long, Long, Long)])
        : Iterator[ClosedInterval] = {
      var out = List.empty[ClosedInterval]
      var cur = state.getOption
      rows.toSeq.sortBy(e => (e.tsUs, e.tie)).foreach { e =>
        cur match {
          case None => cur = Some((e.value, e.tsUs, 0L, e.tsUs, e.tie))
          case Some((v, from, late, maxTs, maxTie)) =>
            if (e.tsUs < maxTs || (e.tsUs == maxTs && e.tie <= maxTie))
              // at or before something already observed (duplicates
              // included): late, even if the open interval started
              // earlier — collapsed no-ops advanced the watermark
              cur = Some((v, from, late + 1, maxTs, maxTie))
            else if (e.value != v) {
              out ::= ClosedInterval(key, v, from, e.tsUs, late)
              cur = Some((e.value, e.tsUs, late, e.tsUs, e.tie))
            } else
              // same value: no-op repeat, collapsed — but it WAS
              // observed, so the seen-watermark advances
              cur = Some((v, from, late, e.tsUs, e.tie))
        }
      }
      cur.foreach(state.update)
      out.reverse.iterator
    }

    stream.groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }
}
