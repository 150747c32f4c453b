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
