package graft.operators

import graft.SparkSuite

class PackingSpec extends SparkSuite {
  import spark.implicits._

  // token counts 3, 4, 5 in one shard; seqLen 4
  private val docs = Seq(
    (1L, "a b c", "s1"),
    (2L, "d e f g", "s1"),
    (3L, "h i j k l", "s1"),
    (10L, "x y", "s2"))
    .toDF("doc_id", "text", "source")

  test("concat-and-chunk placement is exact") {
    val out = Packing.concatChunk(docs, "doc_id", "text", "source", 4L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc1: [0,3) -> pack 0 only
    assert(out(1L).getAs[Long]("start_off") == 0L)
    assert(out(1L).getAs[Long]("first_pack") == 0L)
    assert(out(1L).getAs[Long]("last_pack") == 0L)
    // doc2: [3,7) -> spans packs 0..1, offset 3
    assert(out(2L).getAs[Long]("first_pack") == 0L)
    assert(out(2L).getAs[Long]("last_pack") == 1L)
    assert(out(2L).getAs[Long]("pack_offset") == 3L)
    // doc3: [7,12) -> spans packs 1..2
    assert(out(3L).getAs[Long]("first_pack") == 1L)
    assert(out(3L).getAs[Long]("last_pack") == 2L)
    // shards pack independently: s2 starts at offset 0 again
    assert(out(10L).getAs[Long]("start_off") == 0L)
    assert(out(10L).getAs[Long]("first_pack") == 0L)
  }

  test("shard summary counts packs and padding") {
    val packed = Packing.concatChunk(docs, "doc_id", "text", "source", 4L)
    val s = Packing.shardSummary(packed, 4L)
      .collect().map(r => r.getAs[String]("shard") -> r).toMap
    assert(s("s1").getAs[Long]("n_packs") == 3L)   // 12 tokens / 4
    assert(s("s1").getAs[Long]("pad_tokens") == 0L)
    assert(s("s2").getAs[Long]("n_packs") == 1L)   // 2 tokens -> 1 block
    assert(s("s2").getAs[Long]("pad_tokens") == 2L)
  }

  test("duplicate ids get non-overlapping spans (ROWS frame, not RANGE)") {
    val dup = Seq((1L, "a b c", "s1"), (1L, "d e", "s1"))
      .toDF("doc_id", "text", "source")
    val out = Packing.concatChunk(dup, "doc_id", "text", "source", 4L)
      .orderBy("start_off")
      .collect()
    // RANGE framing would give BOTH rows end_off = 5; ROWS framing
    // places them back to back
    assert(out.map(_.getAs[Long]("start_off")).toSeq == Seq(0L, 3L) ||
      out.map(_.getAs[Long]("start_off")).toSeq == Seq(0L, 2L))
    val spans = out.map(r =>
      (r.getAs[Long]("start_off"), r.getAs[Long]("start_off") + r.getAs[Long]("n_tokens")))
    assert(spans(0)._2 == spans(1)._1) // contiguous, non-overlapping
  }

  test("adding a shard never moves another shard's placements") {
    val base = Packing.concatChunk(docs, "doc_id", "text", "source", 4L)
    val more = docs.union(Seq((20L, "p q r s t u", "s3")).toDF("doc_id", "text", "source"))
    val again = Packing.concatChunk(more, "doc_id", "text", "source", 4L)
      .filter($"shard" =!= "s3")
    assert(base.except(again).isEmpty && again.except(base).isEmpty)
  }
}
