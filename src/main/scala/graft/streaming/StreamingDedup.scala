package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exact deduplication — the continuous counterpart of
  * Dedup.exact for ingest pipelines: duplicates arriving within the
  * watermark delay are dropped with bounded state (keys expire once
  * the watermark passes), so state is O(arrival rate x delay), not
  * O(stream history).
  */
object StreamingDedup {

  /** Drop duplicate rows by `keyCols` among events whose `tsCol` is
    * within the watermark delay of each other.
    */
  def exactWithinWatermark(events: DataFrame, keyCols: Seq[String],
      tsCol: String, delay: String): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)
}
