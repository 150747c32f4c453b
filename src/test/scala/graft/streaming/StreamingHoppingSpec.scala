package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.operators.Hopping

class StreamingHoppingSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("append-mode closed windows equal the batch kernel row for row") {
    implicit val ctx = spark.sqlContext
    val b1 = Seq(
      (ts("2024-01-01 00:02:00"), "a", 1.5),
      (ts("2024-01-01 00:20:00"), "b", 4.0),
      (ts("2024-01-01 00:44:00"), "a", 2.25))
    val b2 = Seq(
      (ts("2024-01-01 01:05:00"), "a", 8.0),
      (ts("2024-01-01 01:31:00"), "b", 16.0))
    // far-future flush: advances the watermark past every b1/b2 window
    val flush = Seq((ts("2024-01-01 12:00:00"), "z", 0.0))

    val in = MemoryStream[(Timestamp, String, Double)]
    val query = StreamingHopping.hopAgg(
        in.toDS().toDF("ts", "key", "value"),
        "ts", "key", "value", 3600L, 900L, lateness = "10 minutes")
      .writeStream.format("memory").queryName("hopping_parity")
      .outputMode("append").start()
    try {
      // the watermark a batch uses comes from the PREVIOUS batch's max
      // event time, so the flush fires twice: once to raise it, once
      // to emit under it
      Seq(b1, b2, flush, flush).foreach { b =>
        in.addData(b: _*); query.processAllAvailable()
      }
      val streamed = spark.table("hopping_parity")
        .select($"ws", $"we", $"key", $"n", $"sum_value")
        .as[(Timestamp, Timestamp, String, Long, Double)]
        .collect().toSet
      val batch = Hopping.hopAgg((b1 ++ b2).toDF("ts", "key", "value"),
          "ts", "key", "value", 3600L, 900L)
        .select($"ws", $"we", $"key", $"n", $"sum_value")
        .as[(Timestamp, Timestamp, String, Long, Double)]
        .collect().toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
      // every emitted window is genuinely closed (end at or before the
      // flush watermark 11:50)
      assert(streamed.forall(_._2.getTime <=
        ts("2024-01-01 11:50:00").getTime))
    } finally query.stop()
  }

  test("state is dropped as windows close (no unbounded aggregation state)") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val query = StreamingHopping.hopAgg(
        in.toDS().toDF("ts", "key", "value"),
        "ts", "key", "value", 3600L, 900L, lateness = "0 seconds")
      .writeStream.format("memory").queryName("hopping_state")
      .outputMode("append").start()
    try {
      // hour-apart batches: each closes the previous hour's windows
      for (h <- 0 until 4) {
        in.addData((ts(f"2024-01-01 0$h%d:05:00"), "a", 1.0))
        query.processAllAvailable()
      }
      val p = query.lastProgress
      val stateRows = Option(p.stateOperators).toSeq.flatten
        .map(_.numRowsTotal).sum
      // open windows only: at most size/slide (4) positions for the
      // latest event, never the 16 a stateless-expiry bug would retain
      assert(stateRows <= 8, s"state rows = $stateRows")
    } finally query.stop()
  }
}
