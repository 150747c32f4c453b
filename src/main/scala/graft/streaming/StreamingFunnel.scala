package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A27s: streaming strict staged funnel — the live twin of
  * [[graft.operators.Funnel.strict]]: per entity, stage k counts only
  * at its first qualifying occurrence STRICTLY after the entity's
  * stage-(k-1) time (a purchase before the click does not convert).
  *
  * The batch plan's per-stage min-after-previous chain is exactly the
  * greedy in-order automaton: watch for the NEXT stage only, advance
  * when it arrives strictly later than the last advance. So per-entity
  * state is three numbers — (depth, last-advance ts, late meter) plus
  * the (max ts, max tie) seen-watermark — FOREVER, regardless of how
  * many events the entity produces: the A6s/SCD2 bounded-state class,
  * no windows over history.
  *
  * Out-of-order rows are COUNTED AND EXCLUDED (`n_late` rides on every
  * emit), judged against the max (ts, tie) the entity has observed —
  * the SCD2 discipline: a late earlier event could create an EARLIER
  * valid chain, which no bounded state can revise (it would need the
  * entity's full history), so the meter surfaces watermark violations
  * instead of silently emitting a depth the batch recompute would
  * contradict. In-order replay (any micro-batch split) reproduces the
  * batch funnel EXACTLY — spec-pinned via the prefix-count report.
  *
  * Each micro-batch emits the entity's refreshed progress (Update
  * mode); the funnel report is one downstream count per depth over the
  * latest emit per entity.
  */
object StreamingFunnel {

  final case class FunnelEvent(user_id: Long, tsUs: Long, tie: Long,
      etype: String)

  final case class FunnelProgress(user_id: Long, depth: Int,
      reached_us: Long, n_late: Long)

  def progress(events: Dataset[FunnelEvent],
      stages: Seq[String]): Dataset[FunnelProgress] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = events.sparkSession
    import spark.implicits._

    // state: (depth, ts of last advance, max ts seen, max tie seen,
    // n_late)
    def update(uid: Long, rows: Iterator[FunnelEvent],
        state: GroupState[(Int, Long, Long, Long, Long)])
        : Iterator[FunnelProgress] = {
      var (depth, tLast, maxTs, maxTie, late) = state.getOption
        .getOrElse((0, Long.MinValue, Long.MinValue, Long.MinValue, 0L))
      rows.toSeq.sortBy(e => (e.tsUs, e.tie)).foreach { e =>
        if (e.tsUs < maxTs || (e.tsUs == maxTs && e.tie <= maxTie))
          // at or before something already observed (duplicates
          // included): late — the batch chain over full history might
          // differ, so the meter ticks instead of a silent wrong depth
          late += 1
        else {
          maxTs = e.tsUs
          maxTie = e.tie
          if (depth < stages.length && e.etype == stages(depth) &&
              (depth == 0 || e.tsUs > tLast)) {
            depth += 1
            tLast = e.tsUs
          }
        }
      }
      state.update((depth, tLast, maxTs, maxTie, late))
      Iterator.single(FunnelProgress(uid, depth,
        if (depth == 0) -1L else tLast, late))
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
  }
}
