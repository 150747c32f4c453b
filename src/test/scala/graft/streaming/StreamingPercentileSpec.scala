package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

final case class PEvent(host: String, value: Double, ts: Timestamp)

class StreamingPercentileSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream sketch percentile: exact in the under-accuracy regime, batch parity, bounded state") {
    val sq = spark
    implicit val ctx = sq.sqlContext

    // two /24 networks, 40 values each inside one 10-minute window —
    // far under accuracy=10000, so the GK sketch holds every value
    val rows = (1 to 40).flatMap { i =>
      Seq(
        PEvent(s"10.0.0.${i % 200}", i.toDouble, ts(f"2024-01-01 00:0${i % 5}:00")),
        PEvent(s"10.0.1.${i % 200}", (i * 3).toDouble, ts(f"2024-01-01 00:0${i % 5}:00")))
    }
    val mem = MemoryStream[PEvent]
    val out = StreamingPercentile.perNetwork(mem.toDF(),
      "host", "value", "ts", fraction = 0.95,
      windowDuration = "10 minutes", slideDuration = "10 minutes",
      watermarkDelay = "0 seconds", prefix = 24)
    val query = out.writeStream.format("memory")
      .queryName("pct_stream").outputMode("append").start()
    val got = try {
      mem.addData(rows: _*)
      // a late tick past the watermark finalizes the window
      mem.addData(PEvent("10.0.0.1", 0.0, ts("2024-01-01 01:00:00")))
      query.processAllAvailable()
      spark.table("pct_stream")
        .filter(col("n_events") === 40)
        .collect().map(r => r.getAs[String]("network") ->
          (r.getAs[Long]("n_events"), r.getAs[Double]("p_value"))).toMap
    } finally query.stop()

    assert(got.keySet == Set("10.0.0.0", "10.0.1.0"), got.keySet.toString)

    // batch parity: the identical aggregate on the identical slice —
    // the same-function zero-drift contract the other twins pin
    val batch = rows.toDF()
      .withColumn("network",
        graft.functions.IpFunctions.numToIp4(
          graft.functions.IpFunctions.networkOf(
            graft.functions.IpFunctions.ip4ToNum(col("host")), 24)))
      .groupBy("network")
      .agg(expr("approx_percentile(value, 0.95, 10000)").as("p_value"))
      .collect().map(r => r.getAs[String]("network") -> r.getAs[Double]("p_value"))
      .toMap
    for ((net, (_, p)) <- got) assert(p == batch(net), s"$net: $p != ${batch(net)}")

    // under-accuracy regime: the sketch result is an EXACT element
    // within one rank of the integer rank-selection target (the two
    // definitions may differ by one position at the boundary, never
    // by value distance)
    val vals1 = (1 to 40).map(_.toDouble).sorted
    assert(vals1.contains(got("10.0.0.0")._2))
    val target = vals1((math.ceil(0.95 * 40).toInt - 1).max(0))
    val idx = vals1.indexOf(got("10.0.0.0")._2)
    assert(math.abs(idx - vals1.indexOf(target)) <= 1,
      s"sketch picked rank $idx vs target ${vals1.indexOf(target)}")
  }
}
