package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.operators.Dedup

final case class TrainDoc(doc_id: Long, text: String)

class StreamingDecontaminateSpec extends SparkSuite {

  private val evalPassage = (1 to 10).map(i => s"E$i").mkString(" ")
  private val shortShared = "F1 F2 F3 F4 F5"

  private val trainRows = Seq(
    TrainDoc(1L, s"t1 t2 $evalPassage t3 $shortShared t4"), // long span scrubbed
    TrainDoc(2L, "clean document with entirely original content never seen in eval data"),
    TrainDoc(3L, s"u1 u2 u3 $shortShared u4 u5 u6 u7 u8"), // short overlap only
    TrainDoc(4L, s"$evalPassage"), // doc IS the eval passage: full removal
    TrainDoc(5L, "tiny")) // < n tokens: skipped entirely

  private val evalRows = Seq(
    (100L, s"e1 $evalPassage e2 e3 e4"),
    (101L, s"e5 e6 $shortShared e7 e8 e9"))

  test("stream scrub: affected docs emit the batch verdict, clean/short/tiny emit nothing") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext

    val evalc = evalRows.toDF("doc_id", "text")
    val mem = MemoryStream[TrainDoc]
    val out = StreamingDecontaminate.scrub(mem.toDF(), evalc,
      "doc_id", "text", n = 5, minSpanLen = 8)

    val query = out.writeStream.format("memory")
      .queryName("decon_stream").outputMode("append").start()
    val stream = try {
      mem.addData(trainRows: _*)
      query.processAllAvailable()
      spark.table("decon_stream").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_tokens"), r.getAs[Long]("removed_tokens"),
            r.getAs[Long]("n_spans_removed"), r.getAs[String]("keep_hash"))))
        .toMap
    } finally query.stop()

    // exact batch parity, row for row
    val batch = Dedup.scrubContamination(
        trainRows.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"),
        evalc, "doc_id", "text", 5, 8)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("removed_tokens"),
          r.getAs[Long]("n_spans_removed"), r.getAs[String]("keep_hash"))))
      .toMap
    assert(stream == batch)
    // and the batch side asserts what we expect it to
    assert(batch.keySet == Set(1L, 4L))
    assert(batch(1L)._2 == 10L && batch(1L)._3 == 1L)
    // full removal: keep_hash is md5 of the empty string
    assert(batch(4L)._2 == 10L &&
      batch(4L)._4 == "d41d8cd98f00b204e9800998ecf8427e")
  }

  test("stream scrub: second micro-batch sees the same static eval set; no state carried") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext

    val evalc = evalRows.toDF("doc_id", "text")
    val mem = MemoryStream[TrainDoc]
    val out = StreamingDecontaminate.scrub(mem.toDF(), evalc,
      "doc_id", "text", n = 5, minSpanLen = 8)
    val query = out.writeStream.format("memory")
      .queryName("decon_stream2").outputMode("append").start()
    try {
      mem.addData(TrainDoc(10L, s"a $evalPassage b"))
      query.processAllAvailable()
      mem.addData(TrainDoc(11L, s"c d $evalPassage"))
      query.processAllAvailable()
      val rows = spark.table("decon_stream2").collect()
        .map(r => r.getAs[Long]("doc_id")).sorted.toSeq
      assert(rows == Seq(10L, 11L))
      // zero retained state: the group function never calls update
      val progress = query.lastProgress
      val stateRows = Option(progress).flatMap(p =>
        p.stateOperators.headOption).map(_.numRowsTotal).getOrElse(0L)
      assert(stateRows == 0L, s"state store should stay empty, saw $stateRows")
    } finally query.stop()
  }
}
