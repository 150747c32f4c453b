package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** P4: sequence packing — the concat-and-chunk layout pretraining jobs
  * feed the trainer: within each shard, documents (in deterministic id
  * order) are conceptually concatenated and cut into fixed `seqLen`
  * token blocks; each doc is mapped to its [first_pack, last_pack]
  * block span and offset. Everything is integer arithmetic (DIV/%), so
  * placements are exact and engine-independent.
  *
  * Scale shape: one window per shard key, shuffled on `shardCol` — the
  * natural unit a 100 TB corpus is already bucketed by (file, bucket,
  * or source). No global ordering is ever required: packs are
  * numbered within the shard, so shards pack independently and in
  * parallel, and adding a shard never renumbers another.
  */
object Packing {

  def concatChunk(df: DataFrame, idCol: String, textCol: String,
      shardCol: String, seqLen: Long): DataFrame = {
    require(seqLen > 0, s"invalid seqLen=$seqLen")
    // explicit ROWS frame: the default RANGE frame treats equal
    // doc_ids as peers and would hand both duplicates the combined
    // end offset (overlapping spans). With the ROWS frame, placement
    // is always non-overlapping; (shard, doc_id) should still be
    // unique for the order itself to be deterministic.
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol).as("doc_id"), col(shardCol).as("shard"),
        size(Dedup.tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("end_off", sum(col("n_tokens")).over(w))
      .withColumn("start_off", col("end_off") - col("n_tokens"))
      .select(col("doc_id"), col("shard"), col("n_tokens"), col("start_off"),
        expr(s"start_off DIV $seqLen").as("first_pack"),
        expr(s"(end_off - 1) DIV $seqLen").as("last_pack"),
        (col("start_off") % seqLen).as("pack_offset"))
  }

  /** P10: token-window chunking — cut each document into `window`-token
    * chunks whose starts advance by `stride` tokens (overlap =
    * window - stride), the within-doc complement of [[concatChunk]]
    * (which packs ACROSS docs) and the prep step for context-bounded
    * training/retrieval. Chunk count is closed-form
    * (`1 + ceil((n - window) / stride)` for n > window, else 1), so the
    * layout is pure integer arithmetic — exact and engine-independent;
    * the final chunk is the only short one and always has >= 1 token
    * (requires stride <= window).
    *
    * Emits `chunk_hash` (md5 of the space-joined token slice) rather
    * than the chunk text — content-exact for verification without
    * re-materializing ~(window/stride)x the corpus bytes.
    *
    * Scale shape: entirely row-local (tokenize, sequence, explode) —
    * no shuffle, no state; runs unchanged on a stream.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"invalid chunking: window=$window stride=$stride")
    // null text coalesces to "": it then behaves like whitespace-only
    // text (one 1-token chunk of the empty token) instead of silently
    // VANISHING from the chunk table (explode of a null sequence drops
    // the row) — every input doc yields at least one output row
    df.select(col(idCol).as("doc_id"),
        Dedup.tokens(coalesce(col(textCol), lit(""))).as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_chunks",
        when(col("n_tokens") <= window, lit(1L))
          .otherwise(lit(1L) +
            expr(s"(n_tokens - $window + $stride - 1) DIV $stride")))
      .withColumn("chunk_id", explode(sequence(lit(0L), col("n_chunks") - 1L)))
      .withColumn("token_start", col("chunk_id") * stride + 1L)
      .withColumn("chunk_tokens",
        least(lit(window.toLong), col("n_tokens") - col("token_start") + 1L))
      .select(col("doc_id"), col("n_tokens"), col("chunk_id"),
        col("token_start"), col("chunk_tokens"),
        md5(concat_ws(" ", slice(col("toks"),
          col("token_start").cast("int"),
          col("chunk_tokens").cast("int")))).as("chunk_hash"))
  }

  /** Shard-level pack summary: blocks produced and the padding wasted
    * in each shard's final partial block.
    */
  def shardSummary(packed: DataFrame, seqLen: Long): DataFrame =
    packed.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        (max(col("last_pack")) + 1L).as("n_packs"))
      .withColumn("pad_tokens",
        col("n_packs") * seqLen - col("n_tokens"))
}
