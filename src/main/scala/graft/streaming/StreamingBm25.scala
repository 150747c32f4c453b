package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.TextAnalysis

/** T16s: BM25 scoring of a LIVE document stream against STATIC corpus
  * statistics with ZERO streaming state — the at-ingest relevance
  * filter of the serving family (the T13s quality-filter shape with a
  * retrieval scoring function): route or drop documents the moment
  * they arrive, by how well they match a standing query profile.
  *
  * The split is the whole design: [[TextAnalysis.bm25Stats]] reduces
  * the reference corpus to ONE broadcast row offline;
  * [[TextAnalysis.bm25Score]] is row-local by construction (in-row
  * term counts, one fixed float expression), so the stream side has
  * no aggregation, no watermark, no state store. The streamed scores
  * are bit-identical to batch scoring against the same stats row
  * (spec-pinned), because the score never depends on which other
  * documents share the micro-batch.
  *
  * A global top-k is deliberately NOT offered on the stream — rank
  * against unbounded history is state by definition; compose with the
  * A42s streaming leaderboard when a live top-k is wanted.
  */
object StreamingBm25 {

  def score(stream: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], stats: DataFrame, k1: Double = 1.2,
      b: Double = 0.75): DataFrame =
    TextAnalysis.bm25Score(stream, idCol, textCol, terms, stats, k1, b)
}
