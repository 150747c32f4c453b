package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Baseline.BaselineConfig

/** Operational semantics: the streaming baseline writes to a durable
  * sink with a checkpoint; stopping and restarting the query resumes
  * from the checkpoint and finalized windows appear exactly once.
  */
class StreamingCheckpointSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("file sink + checkpoint restart emits finalized windows exactly once") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext

    val base = java.nio.file.Files
      .createTempDirectory("graft-stream").toString
    val ckpt = s"$base/ckpt"
    val out = s"$base/out"

    val mem = MemoryStream[Ev]
    val cfg = BaselineConfig(
      hostCol = "host", tsCol = "ts", aggregationFunction = "avg",
      metrics = Map("packets" -> col("value")))
    def stream() = StreamingBaseline.perNetwork(
        mem.toDF(), cfg, prefix = 24,
        windowDuration = "10 minutes", slideDuration = "10 minutes",
        watermarkDelay = "0 seconds")
      .select(col("window.start").cast("string").as("w"), col("network"),
        col("n_rows"), col("packets"))

    def start() = stream().writeStream
      .format("parquet")
      .option("checkpointLocation", ckpt)
      .option("path", out)
      .outputMode("append")
      .start()

    // window 1 data, then an event far enough ahead to finalize it
    val q1 = start()
    try {
      mem.addData(
        Ev("10.0.0.1", ts("2024-01-01 00:01:00"), 100.0),
        Ev("10.0.0.2", ts("2024-01-01 00:05:00"), 200.0))
      q1.processAllAvailable()
      mem.addData(Ev("10.0.0.3", ts("2024-01-01 00:25:00"), 50.0))
      q1.processAllAvailable()
    } finally q1.stop()

    // restart from the checkpoint; finalize window 2 with a later event
    val q2 = start()
    try {
      mem.addData(Ev("10.0.0.4", ts("2024-01-01 00:45:00"), 75.0))
      q2.processAllAvailable()
    } finally q2.stop()

    val rows = spark.read.parquet(out)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("packets")))
    // no duplicates across the restart
    assert(rows.length == rows.map(_._1).distinct.length, s"dup rows: ${rows.toSeq}")
    val m = rows.toMap
    assert(m(("2024-01-01 00:00:00", "10.0.0.0")) == ((2L, 150L)))
    assert(m(("2024-01-01 00:20:00", "10.0.0.0")) == ((1L, 50L)))
  }
}
