package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** R29s: streaming threshold alerting with hysteresis — the live form
  * of `Changepoint.hysteresis`, and the shape the reference actually
  * runs continuously (raise a ban when the metric exceeds `hi`, clear
  * it when it falls to `lo` or below — never flap inside (lo, hi]).
  *
  * State per key: ONE boolean (is the alert up) + the last processed
  * tick, forever — the minimal monitoring state machine. Ticks are
  * processed in t order within each micro-batch; a tick at or before
  * the last processed t is counted in `n_late` and excluded (alert
  * history cannot be revised once later ticks have been judged — the
  * SCD2/A67s discipline), so run the bucketing stage behind a
  * watermark sized to the acceptable lag.
  *
  * Emits one row per ACCEPTED tick with the post-tick state and the
  * transition event ('raise'/'clear'/NULL); on in-order replay the
  * (key, t, v, alert, event) rows equal the batch operator's
  * row-for-row (spec-pinned across micro-batch splits). A batch
  * containing only late ticks emits nothing — the bumped `n_late`
  * meter rides the key's NEXT accepted emission (the meter is
  * cumulative state, not a per-batch row).
  */
object StreamingHysteresis {

  final case class Tick(key: String, t: Long, v: Long)

  final case class AlertRow(key: String, t: Long, v: Long, alert: Long,
      event: Option[String], n_late: Long)

  def alerts(ticks: Dataset[Tick], hi: Long, lo: Long): Dataset[AlertRow] = {
    require(lo < hi, s"need lo < hi, got lo=$lo hi=$hi")
    val spark = ticks.sparkSession
    import spark.implicits._

    def update(key: String, rows: Iterator[Tick],
        state: GroupState[(Boolean, Long, Long)]): Iterator[AlertRow] = {
      var (alert, lastT, nLate) = state.getOption
        .getOrElse((false, Long.MinValue, 0L))
      val out = Seq.newBuilder[AlertRow]
      rows.toSeq.sortBy(_.t).foreach { tk =>
        if (tk.t <= lastT) nLate += 1
        else {
          val next = if (alert) tk.v > lo else tk.v > hi
          val event =
            if (next && !alert) Some("raise")
            else if (!next && alert) Some("clear")
            else None
          alert = next
          lastT = tk.t
          out += AlertRow(key, tk.t, tk.v, if (alert) 1L else 0L, event,
            nLate)
        }
      }
      state.update((alert, lastT, nLate))
      out.result().iterator
    }

    ticks.groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
  }
}
