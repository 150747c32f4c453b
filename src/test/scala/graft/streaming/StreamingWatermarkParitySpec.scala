package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.TextAnalysis

final case class WDoc(doc_id: Long, text: String, ts: Timestamp)

/** Pins the one batch/stream parity edge the per-operator specs don't:
  * what happens AT and BELOW the watermark. Identical rows drive the
  * batch kernels and the streaming twins of line-dedup (T12s) and
  * LM-scoring (T13s):
  *
  *   - a row at or below the watermark when its microbatch runs is
  *     DROPPED by the stream — the boundary is INCLUSIVE (an
  *     event-time equal to the watermark is already late; pinned here
  *     empirically, not assumed). Batch, having no arrival order,
  *     still scores such rows — the documented divergence late data
  *     buys,
  *   - every row the stream ACCEPTS produces the byte-identical row
  *     the batch kernel produces — lateness can drop, never distort.
  */
class StreamingWatermarkParitySpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("line-dedup twin: late row dropped at the boundary, survivors batch-identical") {
    val sq = spark
    implicit val ctx = sq.sqlContext

    val corpus = Seq(
      (1L, "nav bar\nbody one\nfooter"),
      (2L, "nav bar\nbody two\nfooter")).toDF("doc_id", "text")
    val mem = MemoryStream[WDoc]
    val out = StreamingLineDedup.clean(mem.toDF(), corpus,
      "doc_id", "text", "ts", watermarkDelay = "10 seconds", minDocs = 2)
    val query = out.writeStream.format("memory")
      .queryName("wm_linededup").outputMode("append").start()
    val got = try {
      // batch 1 advances the watermark to 00:01:50
      mem.addData(
        WDoc(10L, "nav bar\nalpha\nfooter", ts("2024-01-01 00:01:00")),
        WDoc(98L, "tick", ts("2024-01-01 00:02:00")))
      query.processAllAvailable()
      // batch 2: one row exactly AT the watermark (inclusively late),
      // one strictly below it, one ahead of it
      mem.addData(
        WDoc(11L, "nav bar\nboundary\nfooter", ts("2024-01-01 00:01:50")),
        WDoc(12L, "nav bar\ntoo late\nfooter", ts("2024-01-01 00:01:20")),
        WDoc(13L, "nav bar\nahead\nfooter", ts("2024-01-01 00:03:00")))
      query.processAllAvailable()
      // final tick flushes every open group past the watermark
      mem.addData(WDoc(99L, "tick", ts("2024-01-01 01:00:00")))
      query.processAllAvailable()
      spark.table("wm_linededup").collect()
        .map(r => r.getAs[Long]("doc_id") -> r).toMap
    } finally query.stop()

    // both the strictly-late AND the at-watermark row are gone: the
    // lateness boundary is inclusive
    assert(!got.contains(12L), s"late row leaked through: ${got.keySet}")
    assert(!got.contains(11L), s"at-watermark row kept — boundary semantics changed: ${got.keySet}")
    assert(Set(10L, 13L).subsetOf(got.keySet), got.keySet.toString)

    // parity: the batch kernel (same shared aggregates, same index) on
    // the ACCEPTED docs produces identical rows
    val accepted = Seq(
      (10L, "nav bar\nalpha\nfooter"),
      (13L, "nav bar\nahead\nfooter")).toDF("doc_id", "text")
    val batch = TextAnalysis.lineRows(accepted, "doc_id", "text")
      .join(TextAnalysis.hotLines(corpus, "doc_id", "text", 2), Seq("__h"), "left")
      .groupBy(col("doc_id"))
      .agg(TextAnalysis.lineCleanAggs.head, TextAnalysis.lineCleanAggs.tail: _*)
      .withColumn("dup_line_frac", TextAnalysis.dupLineFrac4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    for (id <- Seq(10L, 13L)) {
      assert(got(id).getAs[Long]("n_lines") == batch(id).getAs[Long]("n_lines"))
      assert(got(id).getAs[Long]("n_dropped") == batch(id).getAs[Long]("n_dropped"))
      assert(got(id).getAs[Double]("dup_line_frac") ==
        batch(id).getAs[Double]("dup_line_frac"))
      assert(got(id).getAs[String]("kept_hash") ==
        batch(id).getAs[String]("kept_hash"))
    }
  }

  test("LM-score twin: late row dropped at the boundary, survivors batch-identical") {
    val sq = spark
    implicit val ctx = sq.sqlContext

    val train = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the rug")).toDF("doc_id", "text")
    val mem = MemoryStream[WDoc]
    val out = StreamingQuality.score(mem.toDF(), train,
      "doc_id", "text", "ts", watermarkDelay = "10 seconds",
      thresholdMicro4 = -30000L)
    val query = out.writeStream.format("memory")
      .queryName("wm_quality").outputMode("append").start()
    val got = try {
      mem.addData(
        WDoc(10L, "the cat sat", ts("2024-01-01 00:01:00")),
        WDoc(98L, "the dog", ts("2024-01-01 00:02:00")))
      query.processAllAvailable()
      mem.addData(
        WDoc(11L, "the dog sat", ts("2024-01-01 00:01:50")),   // at watermark
        WDoc(12L, "the mat the rug", ts("2024-01-01 00:01:20")), // strictly late
        WDoc(13L, "on the mat", ts("2024-01-01 00:03:00")))
      query.processAllAvailable()
      mem.addData(WDoc(99L, "the cat", ts("2024-01-01 01:00:00")))
      query.processAllAvailable()
      spark.table("wm_quality").collect()
        .map(r => r.getAs[Long]("doc_id") -> r).toMap
    } finally query.stop()

    assert(!got.contains(12L), s"late row leaked through: ${got.keySet}")
    assert(!got.contains(11L), s"at-watermark row kept — boundary semantics changed: ${got.keySet}")
    assert(Set(10L, 13L).subsetOf(got.keySet), got.keySet.toString)

    val accepted = Seq(
      (10L, "the cat sat"),
      (13L, "on the mat")).toDF("doc_id", "text")
    val batch = TextAnalysis.bigramLmScore(train, accepted, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    for (id <- Seq(10L, 13L)) {
      assert(got(id).getAs[Long]("n_bigrams") == batch(id).getAs[Long]("n_bigrams"))
      assert(got(id).getAs[Long]("n_oov") == batch(id).getAs[Long]("n_oov"))
      assert(got(id).getAs[Double]("avg_logprob") ==
        batch(id).getAs[Double]("avg_logprob"))
    }
  }
}
