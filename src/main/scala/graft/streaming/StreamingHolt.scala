package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import StreamingEwma.Tick

/** R28s: streaming twin of the Holt level+trend baseline
  * (`Baseline.holtForecast`) — per-network state is (current hour,
  * current hour's running count, level, trend, late counter, a
  * closed-once flag), where level/trend reflect every CLOSED hour.
  *
  * Why the hour buffers: the EWMA recurrence is linear in the hour's
  * count (`s = s/2 + x`), so its twin folds same-hour arrivals
  * incrementally. Holt's floor recurrence is NOT —
  * floor((x₁+x₂+s+b)/2) ≠ floor((x₁+s+b)/2) + x₂ — so the current
  * hour accumulates raw and the recurrence applies exactly once, when
  * a later hour closes it. Emitted level/trend are the PROVISIONAL
  * fold including the open hour (what the batch kernel reports when
  * its window ends on that hour); replaying an in-order stream
  * therefore reproduces the batch fold exactly, independent of
  * micro-batch boundaries (spec-pinned, incl. same-hour splits).
  *
  * Gap hours apply the x = 0 recurrence once each, capped at 128
  * steps: the zero-input map (s, b) → (⌊(s+b)/2⌋, ⌊(s'−s+b)/2⌋)
  * halves the state magnitude per step, reaching its fixpoint
  * ((0, 0), or the (−1, −1) negative attractor) within 128 steps
  * for any 64-bit state — and fixpoints are preserved by further
  * steps, so the cap is exact, not an approximation.
  *
  * Late rows (hour < current) are COUNTED AND EXCLUDED (`n_late`) —
  * the two coupled states admit no order-free late merge like the
  * EWMA's pre-decayed contribution; run behind a watermark sized to
  * the acceptable lag and read n_late as the violation meter.
  */
object StreamingHolt extends Serializable {

  final case class NetworkHolt(network: String, last_hour: Long,
      level: Long, trend: Long, forecast: Long, n_late: Long)

  private[streaming] def step(s: Long, b: Long, x: Long): (Long, Long) = {
    val s2 = math.floor((x + s + b) / 2.0).toLong
    (s2, math.floor((s2 - s + b) / 2.0).toLong)
  }

  def perNetwork(ticksDs: Dataset[Tick]): Dataset[NetworkHolt] = {
    val spark = ticksDs.sparkSession
    import spark.implicits._

    def update(network: String, rows: Iterator[Tick],
        state: GroupState[(Long, Long, Long, Long, Long, Boolean)])
        : Iterator[NetworkHolt] = {
      var init = state.exists
      var (curH, curN, s, b, late, closedOnce) =
        state.getOption.getOrElse((0L, 0L, 0L, 0L, 0L, false))
      def close(): Unit = {
        if (!closedOnce) { s = curN; b = 0L; closedOnce = true }
        else { val d = step(s, b, curN); s = d._1; b = d._2 }
      }
      rows.toSeq.groupBy(_.hourIdx).toSeq.sortBy(_._1).foreach {
        case (h, hr) =>
          val n = hr.size.toLong
          if (!init) { init = true; curH = h; curN = n }
          else if (h == curH) curN += n
          else if (h > curH) {
            close()
            var i = 0L
            val gap = h - curH - 1
            while (i < math.min(gap, 128L)) {
              val d = step(s, b, 0L); s = d._1; b = d._2; i += 1
            }
            curH = h; curN = n
          } else late += n
      }
      state.update((curH, curN, s, b, late, closedOnce))
      val (lvl, tr) =
        if (!closedOnce) (curN, 0L) else step(s, b, curN)
      Iterator.single(NetworkHolt(network, curH, lvl, tr, lvl + tr, late))
    }

    ticksDs.groupByKey(_.network)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
  }
}
