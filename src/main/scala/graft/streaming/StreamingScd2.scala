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
  * equality, not a wildcard). Out-of-order rows (ts at or before the
  * open interval's start) are COUNTED AND EXCLUDED (`n_late` rides on
  * every emitted row): interval history admits no order-free late
  * merge — a late state change would have to split an already-emitted
  * interval — so the meter surfaces watermark violations instead of
  * silently rewriting history.
  */
object StreamingScd2 {

  final case class ScdEvent(key: String, tsUs: Long, tie: Long,
      value: Option[String])

  final case class ClosedInterval(key: String, value: Option[String],
      valid_from_us: Long, valid_to_us: Long, n_late: Long)

  def intervals(stream: Dataset[ScdEvent]): Dataset[ClosedInterval] = {
    val spark = stream.sparkSession
    import spark.implicits._

    def update(key: String, rows: Iterator[ScdEvent],
        state: GroupState[(Option[String], Long, Long)])
        : Iterator[ClosedInterval] = {
      var out = List.empty[ClosedInterval]
      var cur = state.getOption
      rows.toSeq.sortBy(e => (e.tsUs, e.tie)).foreach { e =>
        cur match {
          case None => cur = Some((e.value, e.tsUs, 0L))
          case Some((v, from, late)) =>
            if (e.tsUs <= from) cur = Some((v, from, late + 1))
            else if (e.value != v) {
              out ::= ClosedInterval(key, v, from, e.tsUs, late)
              cur = Some((e.value, e.tsUs, late))
            } // same value: no-op repeat, collapsed
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
