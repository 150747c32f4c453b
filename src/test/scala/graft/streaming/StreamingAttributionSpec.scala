package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import StreamingAttribution.Ev

class StreamingAttributionSpec extends SparkSuite {
  import spark.implicits._

  private val L = 100L // lookback seconds
  private val channels = Set("click", "view")

  private def us(sec: Long) = sec * 1000000L

  // user 1: click(10), view(50), purchase(60) -> first click, last view
  //         purchase(200) -> only view(50)? 200-100=100 <= ... 50 < 100 -> direct
  //         click(250), purchase(260) -> single touch both roles
  // user 2: purchase(5) with nothing before -> direct
  //         click(6), click(7), purchase(8) -> first 6, last 7
  private val evs = Seq(
    Ev(1L, us(10), "click", 100L), Ev(1L, us(50), "view", 101L),
    Ev(1L, us(60), "purchase", 102L), Ev(1L, us(200), "purchase", 103L),
    Ev(1L, us(250), "click", 104L), Ev(1L, us(260), "purchase", 105L),
    Ev(2L, us(5), "purchase", 200L), Ev(2L, us(6), "click", 201L),
    Ev(2L, us(7), "click", 202L), Ev(2L, us(8), "purchase", 203L))

  private def batchRows() = {
    val df = evs.toDF()
      .select(col("user_id"), expr("timestamp_micros(us)").as("ts"),
        col("ty").as("event_type"), col("event_id"))
    graft.operators.Attribution.touchAttribution(df,
        "user_id", "ts", "event_type", "event_id", "purchase",
        channels.toSeq, L)
      .orderBy("conv_event_id")
      .as[(Long, Long, Long, Long, String, Option[Long], String, Option[Long])]
      .collect().toSeq
  }

  test("in-order replay equals the batch attribution row-for-row") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val query = StreamingAttribution.perUser(in.toDS(), "purchase", channels, L)
      .writeStream.format("memory").queryName("attr_stream")
      .outputMode("update").start()
    try {
      // split mid-lookback: user 1's click(250) and purchase(260)
      // arrive in a later batch than the earlier history
      val (b1, b2) = evs.partition(_.us <= us(200))
      in.addData(b1: _*); query.processAllAvailable()
      in.addData(b2: _*); query.processAllAvailable()
      val streamed = spark.table("attr_stream")
        .orderBy("conv_event_id")
        .as[(Long, Long, Long, Long, String, Option[Long], String, Option[Long])]
        .collect().toSeq
      assert(streamed == batchRows())
      // explicit arithmetic on one row: conv 102 first=click(100), last=view(101)
      assert(streamed.find(_._1 == 102L).get ==
        ((102L, 1L, us(60), 2L, "click", Some(100L), "view", Some(101L))))
      // out-of-window history -> direct
      assert(streamed.find(_._1 == 103L).get._5 == "direct")
    } finally query.stop()
  }

  test("convType overlapping channelTypes still emits conversions (batch parity)") {
    // regression: an if/else chain classified overlapping-type events
    // as touches ONLY, silencing every conversion; batch lets a
    // conversion attribute to a PRIOR conversion
    implicit val ctx = spark.sqlContext
    val both = channels + "purchase"
    val seq = Seq(
      Ev(5L, us(10), "purchase", 300L), // no prior touch -> direct
      Ev(5L, us(20), "purchase", 301L)) // attributes to purchase 300
    val in = MemoryStream[Ev]
    val query = StreamingAttribution.perUser(in.toDS(), "purchase", both, L)
      .writeStream.format("memory").queryName("attr_overlap")
      .outputMode("update").start()
    try {
      in.addData(seq: _*); query.processAllAvailable()
      val rows = spark.table("attr_overlap").orderBy("conv_event_id")
        .as[(Long, Long, Long, Long, String, Option[Long], String, Option[Long])]
        .collect().toSeq
      val batch = {
        val df = seq.toDF()
          .select(col("user_id"), expr("timestamp_micros(us)").as("ts"),
            col("ty").as("event_type"), col("event_id"))
        graft.operators.Attribution.touchAttribution(df,
            "user_id", "ts", "event_type", "event_id", "purchase",
            both.toSeq, L)
          .orderBy("conv_event_id")
          .as[(Long, Long, Long, Long, String, Option[Long], String, Option[Long])]
          .collect().toSeq
      }
      assert(rows == batch)
      assert(rows.map(r => (r._1, r._5)) ==
        Seq(300L -> "direct", 301L -> "purchase"))
    } finally query.stop()
  }

  test("state stays pruned to the trailing lookback") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val query = StreamingAttribution.perUser(in.toDS(), "purchase", channels, L)
      .writeStream.format("memory").queryName("attr_prune")
      .outputMode("update").start()
    try {
      // 50 touches far in the past, then one recent conversion: the
      // pruned buffer must not attribute any of them
      val old = (0 until 50).map(i => Ev(9L, us(i.toLong), "click", 1000L + i))
      in.addData(old: _*); query.processAllAvailable()
      in.addData(Ev(9L, us(10000), "purchase", 2000L))
      query.processAllAvailable()
      val row = spark.table("attr_prune")
        .filter(col("conv_event_id") === 2000L)
        .select("n_touches", "first_touch").as[(Long, String)].collect().head
      assert(row == ((0L, "direct")))
      val progress = query.lastProgress
      // one state entry (user 9), holding at most the lookback's touches
      assert(progress.stateOperators.head.numRowsTotal == 1)
    } finally query.stop()
  }
}
