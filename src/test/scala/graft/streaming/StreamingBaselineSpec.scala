package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Baseline.{BaselineConfig, ThresholdRule}

final case class Ev(host: String, ts: Timestamp, value: Double)

class StreamingBaselineSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed per-network baseline with thresholds over a stream") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext

    val mem = MemoryStream[Ev]
    val cfg = BaselineConfig(
      hostCol = "host", tsCol = "ts",
      aggregationFunction = "avg",
      metrics = Map("packets" -> col("value")),
      rules = Seq(ThresholdRule("packets", "value * 2", "threshold_pps")))

    val out = StreamingBaseline.perNetwork(
      mem.toDF(), cfg, prefix = 24,
      windowDuration = "10 minutes", slideDuration = "10 minutes",
      watermarkDelay = "5 minutes")

    val query = out.writeStream
      .format("memory")
      .queryName("baseline_stream")
      .outputMode("complete")
      .start()
    try {
      mem.addData(
        Ev("10.0.0.1", ts("2024-01-01 00:01:00"), 100.0),
        Ev("10.0.0.2", ts("2024-01-01 00:02:00"), 200.0),
        Ev("10.0.1.9", ts("2024-01-01 00:03:00"), 50.0),
        Ev("10.0.0.3", ts("2024-01-01 00:11:00"), 300.0))
      query.processAllAvailable()

      val rows = spark.table("baseline_stream")
        .select(col("window.start").cast("string").as("w"), col("network"),
          col("n_rows"), col("packets"), col("threshold_pps"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getAs[Long]("n_rows"), r.getAs[Long]("packets"),
            r.getAs[Long]("threshold_pps")))
        .toMap

      // window 1: two 10.0.0.0/24 rows avg 150, one 10.0.1.0/24 row
      assert(rows(("2024-01-01 00:00:00", "10.0.0.0")) == ((2L, 150L, 300L)))
      assert(rows(("2024-01-01 00:00:00", "10.0.1.0")) == ((1L, 50L, 100L)))
      // window 2: the 00:11 event
      assert(rows(("2024-01-01 00:10:00", "10.0.0.0")) == ((1L, 300L, 600L)))
    } finally query.stop()
  }
}
