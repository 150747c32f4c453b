package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Baseline
import StreamingEwma.Tick

class StreamingEwmaSpec extends SparkSuite {
  import spark.implicits._

  private def hostRows(rows: Seq[(String, Long)]) =
    rows.toDF("host", "hus")
      .select(col("host"), expr("timestamp_micros(hus)").as("ts"))

  test("cross-batch streaming state equals the batch absolute-hour kernel") {
    implicit val ctx = spark.sqlContext
    val hourUs = 3600L * 1000000L
    // three hours of traffic on two networks, split mid-hour across
    // micro-batches (in hour order — the exactness regime)
    val evs = Seq(
      ("10.1.2.3", 100L * hourUs + 1L), ("10.1.2.4", 100L * hourUs + 2L),
      ("10.1.2.3", 100L * hourUs + 3L), // h=100, n=3
      ("10.9.9.9", 100L * hourUs + 4L), // other net, h=100
      ("10.1.2.5", 102L * hourUs + 1L), // gap hour 101 empty -> decay 2x
      ("10.1.2.5", 102L * hourUs + 2L),
      ("10.9.9.8", 103L * hourUs + 1L))
    val (b1, b2) = evs.splitAt(4)

    val in = MemoryStream[Tick]
    val query = StreamingEwma.perNetwork(in.toDS())
      .writeStream.format("memory").queryName("ewma_stream")
      .outputMode("update").start()
    try {
      def asTicks(rs: Seq[(String, Long)]) =
        StreamingEwma.ticks(hostRows(rs), "host", "ts", 24).collect().toSeq
      in.addData(asTicks(b1): _*)
      query.processAllAvailable()
      in.addData(asTicks(b2): _*)
      query.processAllAvailable()

      // last emission per network = final state
      val streamed = spark.table("ewma_stream")
        .groupBy("network")
        .agg(max(struct(col("last_hour"), col("ewma_rate"))).as("s"))
        .select(col("network"), col("s.last_hour"), col("s.ewma_rate"))
        .as[(String, Long, Long)].collect()
        .map { case (n, h, s) => n -> ((h, s)) }.toMap

      val batch = Baseline.ewmaRateAbsolute(hostRows(evs), "host", "ts", 24)
        .as[(String, Long, Long)].collect()
        .map { case (n, h, s) => n -> ((h, s)) }.toMap

      assert(streamed == batch)
      // arithmetic sanity on 10.1.2.0: h100 s=3; h102: 3>>2=0, +2 -> 2
      assert(batch("10.1.2.0") == ((102L, 2L)))
      assert(batch("10.9.9.0") == ((103L, 1L)))
    } finally query.stop()
  }

  test("state survives a checkpointed restart (decay resumes, not resets)") {
    implicit val ctx = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-ewma-ckpt").toString
    val in = MemoryStream[Tick]
    // the memory sink refuses checkpoint recovery; foreachBatch is the
    // recoverable sink shape, collecting emissions on the driver
    val got = new java.util.concurrent.ConcurrentLinkedQueue[StreamingEwma.NetworkEwma]
    def start() = StreamingEwma.perNetwork(in.toDS())
      .writeStream
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[StreamingEwma.NetworkEwma], _: Long) =>
          df.collect().foreach(got.add)
      }
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()

    val q1 = start()
    try {
      in.addData(Seq.fill(8)(Tick("10.0.0.0", 300L)): _*)
      q1.processAllAvailable()
    } finally q1.stop()

    // restart against the same checkpoint: the (hour, rate) state must
    // come back from the state store — NOT restart at zero
    val q2 = start()
    try {
      in.addData(Tick("10.0.0.0", 302L))
      q2.processAllAvailable()
      // restored (h=300, s=8) decays two hours and adds 1: 8>>2 + 1 = 3
      val rows = got.toArray(Array.empty[StreamingEwma.NetworkEwma]).toSeq
      assert(rows.contains(StreamingEwma.NetworkEwma("10.0.0.0", 302L, 3L)),
        s"state not restored: $rows")
    } finally q2.stop()
  }

  test("pre-1970 hours decay, not reset (no negative-hour sentinel)") {
    // Absolute epoch-hour indexes are negative before 1970. A -1
    // initialization sentinel would treat every post-negative-hour row
    // as a fresh state (reset) instead of decaying; both the batch SQL
    // fold and the streaming state machine must use an explicit init
    // flag. h=-5 with 8 events, then h=-3 with 1: s = (8 >> 2) + 1 = 3.
    val hourUs = 3600L * 1000000L
    val evs = Seq.fill(8)(("10.1.2.3", -5L * hourUs)) :+ (("10.1.2.3", -3L * hourUs))
    val batch = Baseline.ewmaRateAbsolute(hostRows(evs), "host", "ts", 24)
      .as[(String, Long, Long)].collect().toSeq
    assert(batch == Seq(("10.1.2.0", -3L, 3L)), s"batch reset instead of decayed: $batch")

    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Tick]
    val query = StreamingEwma.perNetwork(in.toDS())
      .writeStream.format("memory").queryName("ewma_neg")
      .outputMode("update").start()
    try {
      in.addData(Seq.fill(8)(Tick("10.1.2.0", -5L)): _*)
      query.processAllAvailable()
      in.addData(Tick("10.1.2.0", -3L))
      query.processAllAvailable()
      val last = spark.table("ewma_neg")
        .orderBy(col("last_hour")).as[StreamingEwma.NetworkEwma]
        .collect().last
      assert(last == StreamingEwma.NetworkEwma("10.1.2.0", -3L, 3L),
        s"stream reset instead of decayed: $last")
    } finally query.stop()
  }

  test("late cross-batch rows fold in pre-decayed, never reversing decay") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Tick]
    val query = StreamingEwma.perNetwork(in.toDS())
      .writeStream.format("memory").queryName("ewma_late")
      .outputMode("update").start()
    try {
      in.addData(Tick("10.0.0.0", 200L)); query.processAllAvailable()
      in.addData(Tick("10.0.0.0", 204L)); query.processAllAvailable()
      // state now: h=204, s = (1 >> 4) + 1 = 1
      in.addData(Seq.fill(32)(Tick("10.0.0.0", 203L)): _*)
      query.processAllAvailable()
      // late hour 203 (lag 1): contribution 32 >> 1 = 16 -> s = 17
      val last = spark.table("ewma_late")
        .orderBy(col("last_hour")).as[StreamingEwma.NetworkEwma]
        .collect().last
      assert(last == StreamingEwma.NetworkEwma("10.0.0.0", 204L, 17L))
    } finally query.stop()
  }
}
