package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import StreamingZscore.Obs

class StreamingZscoreSpec extends SparkSuite {
  import spark.implicits._

  private def run(batches: Seq[Seq[Obs]], kNum: Long, kDen: Long,
      name: String): Seq[(String, Long, Long, Double, Double, Double, Int)] = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Obs]
    val query = StreamingZscore.perKey(in.toDS(), kNum, kDen)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      batches.foreach { b => in.addData(b: _*); query.processAllAvailable() }
      spark.table(name)
        .withColumn("seq", monotonically_increasing_id())
        .groupBy("key")
        .agg(max_by(struct(col("n_hist"), col("n_current"), col("mean_value"),
          col("std_value"), col("current_avg"), col("is_anomaly")), col("seq")).as("e"))
        .select(col("key"), col("e.n_hist"), col("e.n_current"), col("e.mean_value"),
          col("e.std_value"), col("e.current_avg"), col("e.is_anomaly"))
        .orderBy("key")
        .as[(String, Long, Long, Double, Double, Double, Int)].collect().toSeq
    } finally query.stop()
  }

  test("history-then-current replay equals the batch kernel row for row") {
    // raw (host, value, ts) events: history across the trailing week,
    // current inside the final hour, two /24 networks
    val end = java.sql.Timestamp.valueOf("2024-03-01 12:00:00")
    def at(minsBack: Long) =
      new java.sql.Timestamp(end.getTime - minsBack * 60000L)
    val hist = Seq(
      ("10.1.1.5", 1.25, at(600)), ("10.1.1.9", 3.75, at(300)),
      ("10.1.1.17", 2.5, at(120)), ("10.1.1.3", 4.0, at(90)),
      ("10.2.2.4", 10.0, at(500)), ("10.2.2.8", 12.5, at(400)),
      ("10.2.2.12", 11.0, at(200)))
    val cur = Seq(
      ("10.1.1.7", 9.125, at(30)), ("10.1.1.2", 8.0, at(10)),
      ("10.2.2.9", 11.25, at(45)))
    val events = (hist ++ cur).toDF("host", "value", "ts")

    val batch = graft.operators.Baseline.zscoreAnomaly(events,
        "host", "value", "ts", windowSeconds = 7L * 86400, currentSeconds = 3600L,
        prefix = 24, kNum = 3, kDen = 1)
      .orderBy("network")
      .as[(String, Long, Long, Double, Double, Double, Int)].collect().toSeq

    def obsOf(rows: Seq[(String, Double, java.sql.Timestamp)]) =
      StreamingZscore.observations(rows.toDF("host", "value", "ts"),
        "host", "value", 24).collect().toSeq
    val streamed = run(Seq(obsOf(hist), obsOf(cur)), 3L, 1L, "zscore_parity")
    assert(streamed == batch)
    assert(batch.nonEmpty && batch.map(_._1) == Seq("10.1.1.0", "10.2.2.0"))
  }

  test("one micro-unit flips the flag (exact integer boundary)") {
    // history {1.0, 3.0}: n=2, Σx=4e6, Σx²=1e13 → varNum=4e12; with
    // k=3, m=1 the boundary is |2·sc − 4e6| > 6e6, i.e. sc > 5e6
    val hist = Seq(Obs("a", 1000000L), Obs("a", 3000000L))
    val below = run(Seq(hist, Seq(Obs("a", 5000000L))), 3L, 1L, "zscore_below")
    val above = run(Seq(hist, Seq(Obs("a", 5000001L))), 3L, 1L, "zscore_above")
    assert(below.head._7 == 0 && above.head._7 == 1)
    assert(below.head._4 == 2.0 && below.head._5 == 1.0) // mean 2.0, σ 1.0
  }

  test("first batch for a key scores nothing, later batches score against all history") {
    val b1 = Seq(Obs("k", 1000000L))
    val b2 = Seq(Obs("k", 2000000L))
    val b3 = Seq(Obs("k", 10000000L))
    val out = run(Seq(b1, b2, b3), 3L, 1L, "zscore_accum")
    // last emission: history is b1+b2 (n=2), current is b3
    assert(out == Seq(("k", 2L, 1L, 1.5, 0.5, 10.0, 1)))
  }
}
