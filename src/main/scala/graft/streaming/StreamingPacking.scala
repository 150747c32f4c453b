package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming counterpart of Packing.concatChunk (SURVEY.md §2.3 P4):
  * as documents arrive, each shard's packer appends them to its
  * running token stream and emits the doc's block placement — the
  * shape a live ingest-to-trainer pipeline needs (docs are placed
  * once, immediately, and never re-packed).
  *
  * State per shard is ONE long (the cumulative token offset), updated
  * by flatMapGroupsWithState — bounded regardless of stream length.
  * Placement within a micro-batch is deterministic (docs sort by
  * doc_id before placing); across batches placement follows arrival
  * order, which is the defining difference from the batch operator:
  * batch packs a closed corpus in global id order, streaming packs an
  * open corpus in arrival order. Feeding the same docs in id order
  * yields bit-identical placements to Packing.concatChunk (asserted in
  * StreamingPackingSpec).
  */
object StreamingPacking {

  final case class DocIn(doc_id: Long, shard: String, text: String)

  final case class PackedDoc(
      doc_id: Long,
      shard: String,
      n_tokens: Long,
      start_off: Long,
      first_pack: Long,
      last_pack: Long,
      pack_offset: Long)

  /** docs (streaming, columns doc_id/shard/text) -> per-doc block
    * placements, emitted as each micro-batch is packed.
    */
  def concatChunk(docs: DataFrame, seqLen: Long): Dataset[PackedDoc] = {
    require(seqLen > 0, s"invalid seqLen=$seqLen")
    val spark = docs.sparkSession
    import spark.implicits._

    def place(shard: String, rows: Iterator[DocIn],
        state: GroupState[Long]): Iterator[PackedDoc] = {
      var off = state.getOption.getOrElse(0L)
      // same tokenization as Packing/Dedup.tokens: whitespace split of
      // the trimmed text
      val placed = rows.toSeq.sortBy(_.doc_id).map { d =>
        val n = d.text.trim.split("\\s+").length.toLong
        val start = off
        off += n
        PackedDoc(d.doc_id, shard, n, start,
          start / seqLen, (off - 1) / seqLen, start % seqLen)
      }
      state.update(off)
      placed.iterator
    }

    docs.as[DocIn]
      .groupByKey(_.shard)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(place)
  }
}
