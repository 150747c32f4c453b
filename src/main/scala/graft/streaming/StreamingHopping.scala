package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Hopping

/** A60s: the hopping-window aggregation on a live stream — the SAME
  * [[Hopping.hopAgg]] kernel (Spark's `window()` is one logical
  * operator batch and streaming share), plus an event-time watermark
  * so state is bounded: a window's partial aggregate lives only until
  * the watermark passes its end, then the finalized row emits (append
  * mode) and the state drops. State per key is therefore
  * (size/slide + lateness/slide) windows — constant, chosen by the
  * caller, never growing with stream length.
  *
  * Parity contract (spec-pinned): the append-mode output over a
  * replayed in-order stream equals the batch [[Hopping.hopAgg]] rows
  * for every window the watermark closed. Late events inside the
  * lateness budget still count; beyond it they drop — the standard
  * watermark trade, stated rather than hidden.
  */
object StreamingHopping {

  def hopAgg(stream: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, sizeSeconds: Long, slideSeconds: Long,
      lateness: String = "10 minutes"): DataFrame =
    Hopping.hopAgg(stream.withWatermark(tsCol, lateness),
      tsCol, keyCol, valueCol, sizeSeconds, slideSeconds)
}
