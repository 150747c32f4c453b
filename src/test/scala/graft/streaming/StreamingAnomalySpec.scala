package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite

final case class Flow(host: String, ts: Timestamp, value: Double)

class StreamingAnomalySpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("live windows are scored against the static robust profile") {
    val sq = spark
    implicit val ctx = sq.sqlContext

    // profile says 10.0.0.0/24 normally runs med=10 mad=2
    val profile = Seq(("10.0.0.0", 10.0, 2.0), ("10.0.1.0", 100.0, 5.0))
      .toDF("network", "med", "mad")

    val mem = MemoryStream[Flow]
    val out = StreamingAnomaly.score(
      mem.toDF(), profile, "host", "value", "ts", prefix = 24,
      windowDuration = "10 minutes", slideDuration = "10 minutes",
      watermarkDelay = "0 seconds", kNum = 3, kDen = 1)

    val query = out.writeStream.format("memory")
      .queryName("anomaly_stream").outputMode("append").start()
    try {
      // window 1: normal traffic (avg 11, |11-10| <= 6)
      mem.addData(
        Flow("10.0.0.5", ts("2024-01-01 00:01:00"), 10.0),
        Flow("10.0.0.6", ts("2024-01-01 00:02:00"), 12.0))
      // window 2: flood (avg 40, |40-10| > 6)
      mem.addData(
        Flow("10.0.0.5", ts("2024-01-01 00:11:00"), 30.0),
        Flow("10.0.0.6", ts("2024-01-01 00:12:00"), 50.0))
      // advance the watermark past both windows so they close
      mem.addData(Flow("10.0.0.7", ts("2024-01-01 00:31:00"), 10.0))
      query.processAllAvailable()

      val rows = spark.table("anomaly_stream")
        .select("network", "current_avg", "is_anomaly")
        .as[(String, Double, Boolean)].collect().toSet
      assert(rows.contains(("10.0.0.0", 11.0, false)))
      assert(rows.contains(("10.0.0.0", 40.0, true)))
    } finally query.stop()
  }

  test("agrees with the batch flag arithmetic") {
    // same threshold expression as Baseline.madAnomaly: boundary value
    // |avg - med| == k*mad must NOT flag (strict >)
    val sq = spark
    implicit val ctx = sq.sqlContext
    val profile = Seq(("10.0.0.0", 10.0, 2.0)).toDF("network", "med", "mad")
    val mem = MemoryStream[Flow]
    val out = StreamingAnomaly.score(mem.toDF(), profile, "host", "value",
      "ts", 24, "10 minutes", "10 minutes", "0 seconds", 3, 1)
    val query = out.writeStream.format("memory")
      .queryName("anomaly_boundary").outputMode("append").start()
    try {
      mem.addData(Flow("10.0.0.5", ts("2024-01-01 00:01:00"), 16.0)) // avg 16, |16-10| = 6 = 3*2
      mem.addData(Flow("10.0.0.5", ts("2024-01-01 00:31:00"), 0.0))
      query.processAllAvailable()
      val flags = spark.table("anomaly_boundary")
        .select("is_anomaly").as[Boolean].collect()
      assert(flags.length == 1 && !flags.head)
    } finally query.stop()
  }
}
