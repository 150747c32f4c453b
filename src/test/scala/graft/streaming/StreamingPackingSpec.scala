package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.operators.Packing
import StreamingPacking.DocIn

class StreamingPackingSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    DocIn(1L, "s1", "one two three four five"),
    DocIn(2L, "s1", "six seven eight"),
    DocIn(3L, "s1", "nine ten eleven twelve"),
    DocIn(4L, "s2", "a b c d e f g"),
    DocIn(5L, "s2", "h i"))

  private def collectPacked(name: String) =
    spark.table(name)
      .select("doc_id", "shard", "n_tokens", "start_off", "first_pack",
        "last_pack", "pack_offset")
      .as[(Long, String, Long, Long, Long, Long, Long)]
      .collect().toSet

  test("single-batch streaming packing matches the batch operator exactly") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[DocIn]
    val query = StreamingPacking.concatChunk(in.toDF(), seqLen = 4L)
      .writeStream.format("memory").queryName("pack_stream").outputMode("append")
      .start()
    try {
      in.addData(docs: _*)
      query.processAllAvailable()

      val batched = Packing.concatChunk(docs.toDF(), "doc_id", "text", "shard", 4L)
        .select("doc_id", "shard", "n_tokens", "start_off", "first_pack",
          "last_pack", "pack_offset")
        .as[(Long, String, Long, Long, Long, Long, Long)]
        .collect().toSet
      assert(collectPacked("pack_stream") == batched && batched.nonEmpty)
    } finally query.stop()
  }

  test("offsets continue across micro-batches (state carries the shard cursor)") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[DocIn]
    val query = StreamingPacking.concatChunk(in.toDF(), seqLen = 4L)
      .writeStream.format("memory").queryName("pack_stream2").outputMode("append")
      .start()
    try {
      in.addData(docs.filter(_.doc_id <= 2L): _*)
      query.processAllAvailable()
      in.addData(docs.filter(_.doc_id > 2L): _*)
      query.processAllAvailable()

      // arrival order here IS doc_id order, so placements still match
      // the batch pack of the closed corpus
      val batched = Packing.concatChunk(docs.toDF(), "doc_id", "text", "shard", 4L)
        .select("doc_id", "shard", "n_tokens", "start_off", "first_pack",
          "last_pack", "pack_offset")
        .as[(Long, String, Long, Long, Long, Long, Long)]
        .collect().toSet
      assert(collectPacked("pack_stream2") == batched)
      // doc 3 starts where batch 1 left shard s1: 5 + 3 = 8 tokens in
      val d3 = collectPacked("pack_stream2").find(_._1 == 3L).get
      assert(d3._4 == 8L && d3._5 == 2L)
    } finally query.stop()
  }
}
