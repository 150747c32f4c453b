package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.operators.TextAnalysis

final case class QDoc(doc_id: Long, text: String, ts: Timestamp)

class StreamingQualitySpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // train: "a b" dominates, "a c" is the rare continuation
  private val trainRows = Seq(
    (1L, "a b a b a b"), (2L, "a b a b"), (3L, "a c"))

  test("stream scores equal the batch operator and the gate is integer-exact") {
    val sq = spark
    implicit val ctx = sq.sqlContext

    val train = trainRows.toDF("doc_id", "text")
    val mem = MemoryStream[QDoc]
    // threshold -5000 micro4 = avg_logprob >= -0.5
    val out = StreamingQuality.score(mem.toDF(), train,
      "doc_id", "text", "ts", watermarkDelay = "0 seconds",
      thresholdMicro4 = -5000L)

    val query = out.writeStream.format("memory")
      .queryName("quality_stream").outputMode("append").start()
    val got = try {
      mem.addData(
        QDoc(10L, "a b a b", ts("2024-01-01 00:01:00")), // fluent
        QDoc(11L, "a c", ts("2024-01-01 00:01:30")),     // rare
        QDoc(12L, "x y", ts("2024-01-01 00:01:40")),     // all OOV
        QDoc(13L, "solo", ts("2024-01-01 00:01:50")))    // < 2 tokens
      // advance the watermark past the first docs so append finalizes
      mem.addData(QDoc(99L, "a b", ts("2024-01-01 01:00:00")))
      query.processAllAvailable()
      spark.table("quality_stream").collect()
        .map(r => r.getAs[Long]("doc_id") -> r).toMap
    } finally query.stop()

    // one-token docs have no bigrams and produce no row
    assert(!got.contains(13L))
    assert(got.contains(10L) && got.contains(11L) && got.contains(12L))

    // parity with the batch scorer on the same model
    val batch = TextAnalysis.bigramLmScore(
        trainRows.toDF("doc_id", "text"),
        Seq((10L, "a b a b"), (11L, "a c"), (12L, "x y")).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    for (id <- Seq(10L, 11L, 12L)) {
      assert(got(id).getAs[Long]("n_bigrams") == batch(id).getAs[Long]("n_bigrams"))
      assert(got(id).getAs[Long]("n_oov") == batch(id).getAs[Long]("n_oov"))
      assert(got(id).getAs[java.lang.Double]("avg_logprob") ==
        batch(id).getAs[java.lang.Double]("avg_logprob"))
    }

    // the gate: fluent passes, the rare continuation fails the -0.5
    // cut (ln(1/6) ~= -1.79), all-OOV fails closed with a null mean
    assert(got(10L).getAs[Boolean]("pass"))
    assert(!got(11L).getAs[Boolean]("pass"))
    assert(got(12L).getAs[Long]("n_oov") == 1L)
    assert(got(12L).getAs[java.lang.Double]("avg_logprob") == null)
    assert(!got(12L).getAs[Boolean]("pass"))
  }
}
