package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Funnel
import StreamingFunnel.FunnelEvent

class StreamingFunnelSpec extends SparkSuite {
  import spark.implicits._

  private val stages = Seq("view", "click", "buy")
  private val types = Vector("view", "click", "buy", "browse")

  // deterministic per-user event stream, in-order by construction;
  // the type mix leaves some users at every funnel depth
  private def events: Seq[FunnelEvent] =
    for (u <- 0L until 60L; i <- 0 until 12) yield FunnelEvent(
      u, i * 60000000L + u, u * 1000 + i,
      types(((u * 7 + i * 5 + i * i) % 11 % types.length).toInt))

  private def streamedDepths(batches: Seq[Seq[FunnelEvent]],
      name: String): Map[Long, (Int, Long)] = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[FunnelEvent]
    val query = StreamingFunnel.progress(in.toDS(), stages)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      batches.foreach { b => in.addData(b: _*); query.processAllAvailable() }
      spark.table(name)
        .withColumn("seq", monotonically_increasing_id())
        .groupBy("user_id")
        .agg(max_by(struct(col("depth"), col("n_late")), col("seq")).as("p"))
        .select(col("user_id"), col("p.depth"), col("p.n_late"))
        .as[(Long, Int, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    } finally query.stop()
  }

  test("in-order replay reproduces the batch funnel across any split") {
    val evs = events
    val streamed = streamedDepths(
      Seq(evs.take(100), evs.slice(100, 430), evs.drop(430)), "funnel_stream")
    assert(streamed.values.forall(_._2 == 0L), "no event was late")

    val batch = Funnel.strict(
        evs.toDF("user_id", "tsUs", "tie", "etype")
          .withColumn("ts", expr("timestamp_micros(tsUs)")),
        "user_id", "etype", "ts", stages)
      .select("depth", "n_entities").as[(Long, Long)].collect().toMap
    val prefixCounts = (1 to stages.length).map(k =>
      k.toLong -> streamed.values.count(_._1 >= k).toLong).toMap
    assert(prefixCounts == batch,
      s"streamed prefix counts $prefixCounts != batch funnel $batch")
    // the fixture actually exercises every depth, incl. non-completers
    assert(batch(1L) > batch(3L) && batch(3L) > 0)
    assert(streamed.values.exists(_._1 == 0))
  }

  test("strictly-after: a same-timestamp next stage does not convert") {
    val evs = Seq(
      FunnelEvent(1L, 1000000L, 0L, "view"),
      FunnelEvent(1L, 1000000L, 1L, "click"), // same ts as view: no
      FunnelEvent(1L, 2000000L, 2L, "buy"),   // click never matched: no
      FunnelEvent(2L, 1000000L, 0L, "view"),
      FunnelEvent(2L, 2000000L, 1L, "click"),
      FunnelEvent(2L, 2000000L, 2L, "buy"))   // same ts as click: no
    val streamed = streamedDepths(Seq(evs), "funnel_strict")
    assert(streamed(1L)._1 == 1 && streamed(2L)._1 == 2)
    // and the batch operator agrees on both entities
    val batch = Funnel.strict(
        evs.toDF("user_id", "tsUs", "tie", "etype")
          .withColumn("ts", expr("timestamp_micros(tsUs)")),
        "user_id", "etype", "ts", stages)
      .select("depth", "n_entities").as[(Long, Long)].collect().toMap
    // both users start the funnel; only user 2's click is strictly
    // after its view; neither buy converts (user 1 never clicked,
    // user 2's buy ties its click)
    assert(batch == Map(1L -> 2L, 2L -> 1L, 3L -> 0L))
  }

  test("out-of-order rows are counted and excluded, never replayed into the chain") {
    val b1 = Seq(
      FunnelEvent(1L, 2000000L, 0L, "view"),
      FunnelEvent(1L, 3000000L, 1L, "click"))
    // a late earlier view could have started an earlier chain — the
    // meter must tick and the depth must stay at the in-order result
    val b2 = Seq(
      FunnelEvent(1L, 1000000L, 2L, "view"),
      FunnelEvent(1L, 4000000L, 3L, "buy"))
    val streamed = streamedDepths(Seq(b1, b2), "funnel_late")
    assert(streamed(1L) == ((3, 1L)),
      s"want depth 3 with 1 late, got ${streamed(1L)}")
  }
}
