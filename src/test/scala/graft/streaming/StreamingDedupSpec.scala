package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite

final case class Doc(doc_id: Long, ts: Timestamp, text: String)

class StreamingDedupSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("duplicates within the watermark are dropped with bounded state") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext

    val mem = MemoryStream[Doc]
    val out = StreamingDedup.exactWithinWatermark(
      mem.toDF(), Seq("doc_id"), "ts", "10 minutes")

    val query = out.writeStream
      .format("memory")
      .queryName("dedup_stream")
      .outputMode("append")
      .start()
    try {
      mem.addData(
        Doc(1L, ts("2024-01-01 00:00:00"), "a"),
        Doc(1L, ts("2024-01-01 00:01:00"), "a dup"),
        Doc(2L, ts("2024-01-01 00:02:00"), "b"))
      query.processAllAvailable()
      mem.addData(
        Doc(2L, ts("2024-01-01 00:03:00"), "b dup"),
        Doc(3L, ts("2024-01-01 00:04:00"), "c"))
      query.processAllAvailable()

      val ids = spark.table("dedup_stream")
        .select("doc_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally query.stop()
  }
}
