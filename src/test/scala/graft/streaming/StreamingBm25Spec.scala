package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.operators.TextAnalysis

class StreamingBm25Spec extends SparkSuite {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark merge spark spark"),
    (2L, "merge sort join"),
    (3L, "spark"),
    (4L, "nothing relevant here at all whatsoever today"),
    (5L, "merge merge merge merge merge merge merge merge")
  ).toDF("doc_id", "text")

  private val incoming = Seq(
    (10L, "a fresh spark document about merge strategies"),
    (11L, "spark spark spark"),
    (12L, "no relevant terms at all"),
    (13L, "merge"))

  private val terms = Seq("merge", "spark")

  test("streamed scores equal batch scoring against the same stats row") {
    implicit val ctx = spark.sqlContext
    val stats = TextAnalysis.bm25Stats(corpus, "doc_id", "text", terms)
    val in = MemoryStream[(Long, String)]
    val query = StreamingBm25.score(in.toDF().toDF("doc_id", "text"),
        "doc_id", "text", terms, stats)
      .writeStream.format("memory").queryName("bm25_parity")
      .outputMode("append").start()
    try {
      // split across micro-batches: scores are row-local, so batch
      // boundaries must not matter
      in.addData(incoming.take(2): _*); query.processAllAvailable()
      in.addData(incoming.drop(2): _*); query.processAllAvailable()
      val streamed = spark.table("bm25_parity")
        .select($"doc_id", $"dl", $"n_terms_hit", $"bm25")
        .as[(Long, Long, Int, Double)].collect().toSet
      val batch = TextAnalysis.bm25Score(
          incoming.toDF("doc_id", "text"), "doc_id", "text", terms, stats)
        .as[(Long, Long, Int, Double)].collect().toSet
      assert(streamed == batch)
      assert(streamed.map(_._1) == Set(10L, 11L, 13L),
        "no-term docs drop at ingest")
    } finally query.stop()
  }

  test("zero streaming state: plan has no stateful operator") {
    implicit val ctx = spark.sqlContext
    val stats = TextAnalysis.bm25Stats(corpus, "doc_id", "text", terms)
    val in = MemoryStream[(Long, String)]
    val query = StreamingBm25.score(in.toDF().toDF("doc_id", "text"),
        "doc_id", "text", terms, stats)
      .writeStream.format("memory").queryName("bm25_stateless")
      .outputMode("append").start()
    try {
      in.addData(incoming: _*)
      query.processAllAvailable()
      val progress = query.lastProgress
      assert(progress.stateOperators.isEmpty ||
        progress.stateOperators.forall(_.numRowsTotal == 0))
    } finally query.stop()
  }
}
