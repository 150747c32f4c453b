package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite

final case class Click(user_id: Long, click_id: Long, click_ts: Timestamp)
final case class Buy(user_id: Long, buy_id: Long, buy_ts: Timestamp)

class StreamingIntervalJoinSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream-stream window join emits exactly the in-window pairs") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext

    val clicks = MemoryStream[Click]
    val buys = MemoryStream[Buy]
    val out = StreamingIntervalJoin.forwardWindow(
      clicks.toDF(), buys.toDF(), "user_id",
      "click_ts", "buy_ts", maxDeltaSec = 60L, watermarkDelay = "10 minutes")

    val query = out.writeStream
      .format("memory")
      .queryName("interval_stream")
      .outputMode("append")
      .start()
    try {
      clicks.addData(
        Click(1L, 10L, ts("2024-01-01 00:00:00")),
        Click(1L, 11L, ts("2024-01-01 00:05:00")),
        Click(2L, 12L, ts("2024-01-01 00:00:00")))
      buys.addData(
        Buy(1L, 20L, ts("2024-01-01 00:00:30")),  // 30s after click 10
        Buy(1L, 21L, ts("2024-01-01 00:06:00")),  // 60s after click 11
        Buy(1L, 22L, ts("2024-01-01 00:02:00")),  // matches nothing
        Buy(3L, 23L, ts("2024-01-01 00:00:10")))  // wrong user
      query.processAllAvailable()

      val got = spark.table("interval_stream")
        .select("click_id", "buy_id", "delta_us")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == Set((10L, 20L, 30000000L), (11L, 21L, 60000000L)))
    } finally query.stop()
  }

  test("streaming pairs match the batch operator on the same data") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext

    val clickRows = Seq(
      Click(1L, 10L, ts("2024-01-01 00:00:00")),
      Click(1L, 11L, ts("2024-01-01 00:02:00")),
      Click(2L, 12L, ts("2024-01-01 00:01:00")))
    val buyRows = Seq(
      Buy(1L, 20L, ts("2024-01-01 00:00:45")),
      Buy(2L, 21L, ts("2024-01-01 00:01:30")),
      Buy(1L, 22L, ts("2024-01-01 00:03:00")))

    val clicks = MemoryStream[Click]
    val buys = MemoryStream[Buy]
    val out = StreamingIntervalJoin.forwardWindow(
      clicks.toDF(), buys.toDF(), "user_id",
      "click_ts", "buy_ts", 60L, "10 minutes")
    val query = out.writeStream.format("memory")
      .queryName("interval_parity").outputMode("append").start()
    try {
      clicks.addData(clickRows: _*)
      buys.addData(buyRows: _*)
      query.processAllAvailable()
      val streamed = spark.table("interval_parity")
        .select("click_id", "buy_id").as[(Long, Long)].collect().toSet
      val batch = graft.operators.IntervalJoin.forwardWindow(
          clickRows.toDF(), buyRows.toDF(), "user_id",
          "click_ts", "buy_ts", 60L * 1000000L)
        .select("click_id", "buy_id").as[(Long, Long)].collect().toSet
      assert(streamed == batch && batch.nonEmpty)
    } finally query.stop()
  }
}
