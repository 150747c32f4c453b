package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Streaming counterpart of the batch line-level dedup
  * (graft.operators.TextAnalysis.lineDedup): the hot-line index —
  * boilerplate lines seen in >= `minDocs` distinct documents — is
  * built OFFLINE from the curated corpus; the live ingest stream is
  * cleaned against it continuously. Same index-offline/apply-online
  * split as [[StreamingIncremental]] and [[StreamingQuality]]: a
  * boilerplate line must have been seen in the corpus to drop (a line
  * duplicated only WITHIN the live stream is the batch pass's job).
  *
  * Index freshness: [[clean]] builds the index once from `corpus` and
  * CACHES it, so microbatches after the first reuse the materialized
  * table instead of re-running the corpus aggregation per trigger.
  * Refreshing means rebuilding (TextAnalysis.hotLines) and restarting
  * the query on [[cleanWithIndex]] with the new table — the index is
  * a static snapshot by design, not a live view of the corpus.
  *
  * Scale shape: lines explode in-stream keyed by their 128-bit
  * trimmed-line hash (the line text never shuffles for the match),
  * resolve through one unhinted stream-static join, and each document
  * reassembles under a single watermark-finalized aggregation — the
  * cleanup aggregates are the SAME column definitions the batch
  * operator uses, so batch and stream cannot drift.
  */
object StreamingLineDedup {

  /** Persisted hot-line index with owned lifecycle: [[unpersist]] when
    * the cleaning query stops or the index is refreshed.
    */
  final case class HotLineIndexHandle(index: DataFrame) {
    def unpersist(): Unit = index.unpersist()
  }

  /** Build and persist the hot-line index of `corpus`; the returned
    * handle owns the cache lifecycle.
    */
  def index(corpus: DataFrame, idCol: String, textCol: String,
      minDocs: Long = 2): HotLineIndexHandle =
    HotLineIndexHandle(
      TextAnalysis.hotLines(corpus, idCol, textCol, minDocs).persist())

  /** Clean a stream of (`idCol`, `textCol`, `tsCol`) docs against the
    * hot-line index of the static `corpus`. One row per doc: line
    * counts, dropped fraction, and the hash of the document with
    * corpus-boilerplate lines removed (survivors in original order).
    *
    * Convenience entry point: the index persists for the life of the
    * session. A deployment that refreshes the index or stops queries
    * should call [[index]] + [[cleanWithIndex]] and `unpersist()` the
    * handle itself.
    */
  def clean(stream: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, tsCol: String,
      watermarkDelay: String, minDocs: Long = 2): DataFrame =
    cleanWithIndex(stream,
      index(corpus, idCol, textCol, minDocs).index,
      idCol, textCol, tsCol, watermarkDelay)

  /** Same, against a pre-materialized hot-line index (`__h`, `__dup`)
    * — the deployment entry point: build/refresh the index on its own
    * schedule (e.g. a nightly TextAnalysis.hotLines write), hand the
    * loaded table here, and per-trigger cost is one hash join probe.
    */
  def cleanWithIndex(stream: DataFrame, hotIndex: DataFrame,
      idCol: String, textCol: String, tsCol: String,
      watermarkDelay: String): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .select(col(tsCol), col(idCol).as("doc_id"),
        posexplode(split(col(textCol), "\n")).as(Seq("line_no", "line")))
      .withColumn("__h", md5(trim(col("line"))))
      .join(hotIndex, Seq("__h"), "left")
      .groupBy(col(tsCol), col("doc_id"))
      .agg(TextAnalysis.lineCleanAggs.head, TextAnalysis.lineCleanAggs.tail: _*)
      .withColumn("dup_line_frac", TextAnalysis.dupLineFrac4)
      .select(col(tsCol), col("doc_id"), col("n_lines"), col("n_dropped"),
        col("dup_line_frac"), col("kept_hash"))
}
