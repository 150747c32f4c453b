package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.operators.Dedup

final case class IncDoc(doc_id: Long, text: String)

class StreamingIncrementalSpec extends SparkSuite {

  private val base = (1 to 40).map(i => s"tok$i").mkString(" ")

  private val corpusRows = Seq(
    (1L, base),
    (2L, "an unrelated existing document about completely other things entirely"))

  private val incomingRows = Seq(
    IncDoc(10L, base), // exact copy of corpus doc 1
    IncDoc(11L, base + " appended"), // near-dup of corpus doc 1
    IncDoc(12L, "completely fresh material with novel vocabulary throughout entire body"),
    IncDoc(13L, "tiny doc")) // < n tokens: no shingles, exact-only path

  test("stream classify: exact matches authoritative, candidates flag, parity with batch") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext

    val corpus = corpusRows.toDF("doc_id", "text")
    val mem = MemoryStream[IncDoc]
    val out = StreamingIncremental.classify(mem.toDF(), corpus,
      "doc_id", "text", n = 3)

    val query = out.writeStream.format("memory")
      .queryName("inc_stream").outputMode("append").start()
    val stream = try {
      mem.addData(incomingRows: _*)
      query.processAllAvailable()
      spark.table("inc_stream").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("status"), Option(r.getAs[java.lang.Long]("match_id")))))
        .toMap
    } finally query.stop()

    assert(stream(10L) == (("dup_exact", Some(1L))))
    assert(stream(11L)._1 == "near_candidate") // flagged; batch verifies
    assert(stream(12L) == (("new", None)))
    assert(stream(13L) == (("new", None)))

    // parity with the batch operator: exact labels agree; every batch
    // near_dup is flagged near_candidate upstream (candidates are a
    // superset of verified near-dups); every stream `new` is batch `new`
    val batch = Dedup.incremental(corpus,
        incomingRows.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"),
        "doc_id", "text", 3, 1, 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status"))
      .toMap
    for ((id, st) <- batch) st match {
      case "dup_exact" => assert(stream(id)._1 == "dup_exact")
      case "near_dup" => assert(stream(id)._1 == "near_candidate")
      case "new" => assert(stream(id)._1 != "dup_exact")
    }
    for ((id, (st, _)) <- stream if st == "new")
      assert(batch(id) == "new")
  }
}
