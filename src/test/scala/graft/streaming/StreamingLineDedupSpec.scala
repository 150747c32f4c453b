package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite

final case class LDoc(doc_id: Long, text: String, ts: Timestamp)

class StreamingLineDedupSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // "nav bar" and "footer" are corpus boilerplate; "corpus only" is
  // hot in the corpus but absent from the stream
  private val corpusRows = Seq(
    (1L, "nav bar\nbody one\nfooter"),
    (2L, "nav bar\nbody two\nfooter"),
    (3L, "corpus only\nx"),
    (4L, "corpus only\ny"))

  test("stream cleans against the corpus hot-line index, in order") {
    val sq = spark
    implicit val ctx = sq.sqlContext

    val corpus = corpusRows.toDF("doc_id", "text")
    val mem = MemoryStream[LDoc]
    val out = StreamingLineDedup.clean(mem.toDF(), corpus,
      "doc_id", "text", "ts", watermarkDelay = "0 seconds", minDocs = 2)

    val query = out.writeStream.format("memory")
      .queryName("linededup_stream").outputMode("append").start()
    val got = try {
      mem.addData(
        // boilerplate around fresh content -> only the middle survives
        LDoc(10L, "nav bar\nfresh content\nfooter", ts("2024-01-01 00:01:00")),
        // a line duplicated ONLY within the stream must NOT drop:
        // the index is corpus-derived
        LDoc(11L, "stream dup\na", ts("2024-01-01 00:01:10")),
        LDoc(12L, "stream dup\nb", ts("2024-01-01 00:01:20")),
        // blank lines never drop even when every doc has them
        LDoc(13L, "footer\n\nkeep me", ts("2024-01-01 00:01:30")))
      mem.addData(LDoc(99L, "tick", ts("2024-01-01 01:00:00")))
      query.processAllAvailable()
      spark.table("linededup_stream").collect()
        .map(r => r.getAs[Long]("doc_id") -> r).toMap
    } finally query.stop()

    assert(got(10L).getAs[Long]("n_lines") == 3L)
    assert(got(10L).getAs[Long]("n_dropped") == 2L)
    assert(got(10L).getAs[String]("kept_hash") == md5Hex("fresh content"))

    assert(got(11L).getAs[Long]("n_dropped") == 0L)
    assert(got(12L).getAs[Long]("n_dropped") == 0L)
    assert(got(11L).getAs[String]("kept_hash") == md5Hex("stream dup\na"))

    assert(got(13L).getAs[Long]("n_dropped") == 1L) // footer only
    assert(got(13L).getAs[String]("kept_hash") == md5Hex("\nkeep me"))
  }
}
