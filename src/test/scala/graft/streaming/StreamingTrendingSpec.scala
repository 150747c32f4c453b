package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite
import StreamingTrending.DayTypeEvent

class StreamingTrendingSpec extends SparkSuite {
  import spark.implicits._

  /** Replay `batches`, return the compacted counts snapshot (latest
    * emit per (day, type)) as a DataFrame.
    */
  private def streamed(batches: Seq[Seq[DayTypeEvent]], name: String) = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[DayTypeEvent]
    val query = StreamingTrending.counts(in.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      batches.foreach { b => in.addData(b: _*); query.processAllAvailable() }
      spark.table(name)
        .withColumn("seq", monotonically_increasing_id())
        .groupBy("day", "event_type")
        .agg(max_by(col("n_events"), col("seq")).as("n_events"))
        .localCheckpoint(eager = true)
    } finally query.stop()
  }

  // days 100/101/102: rank swaps (a overtakes b), a vanishing type
  // (c absent on 101), a new entrant (d on 102)
  private val evs =
    Seq.fill(3)(DayTypeEvent(100, "a")) ++ Seq.fill(5)(DayTypeEvent(100, "b")) ++
    Seq.fill(2)(DayTypeEvent(100, "c")) ++
    Seq.fill(6)(DayTypeEvent(101, "a")) ++ Seq.fill(4)(DayTypeEvent(101, "b")) ++
    Seq.fill(2)(DayTypeEvent(102, "a")) ++ Seq.fill(2)(DayTypeEvent(102, "b")) ++
    Seq.fill(7)(DayTypeEvent(102, "d"))

  private def batchTrending(events: Seq[DayTypeEvent]) = {
    val counts = events.toDF("day", "eventType")
      .groupBy(col("day"), col("eventType").as("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("day"))
      .orderBy(col("n_events").desc, col("event_type"))
    val ranked = counts.withColumn("rnk", row_number().over(w))
    ranked.join(
        ranked.select((col("day") + 1).as("day"), col("event_type"),
          col("rnk").as("prev_rnk")),
        Seq("day", "event_type"), "left")
      .withColumn("rank_delta", col("prev_rnk") - col("rnk"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .select(col("day"), col("event_type"), col("n_events"), col("rnk"),
      col("prev_rnk"), col("rank_delta"))
    .as[(Int, String, Long, Int, Option[Int], Option[Int])]
    .collect().sortBy(r => (r._1, r._4)).toSeq

  test("replayed leaderboard equals the batch trending frame under any split") {
    // split mid-day so day-100 and day-102 counts accumulate across
    // micro-batches (cross-batch statefulness exercised), plus a LATE
    // day-100 event arriving after day 102 opened — exact fold
    val late = DayTypeEvent(100, "c")
    val all = evs :+ late
    val snap = streamed(
      Seq(evs.take(6), evs.slice(6, 20), evs.drop(20) :+ late), "trend_all")
    assert(rows(StreamingTrending.leaderboard(snap)) ==
      rows(batchTrending(all)))
  }

  test("movement semantics: overtake, vanish, entrant") {
    val got = rows(StreamingTrending.leaderboard(
      streamed(Seq(evs), "trend_sem")))
    val byKey = got.map(r => (r._1, r._2) -> r).toMap
    // day 101: a (6) overtakes b (4) — a moved 2->1, b 1->2
    assert(byKey((101, "a"))._4 == 1 && byKey((101, "a"))._6 == Some(1))
    assert(byKey((101, "b"))._4 == 2 && byKey((101, "b"))._6 == Some(-1))
    // day 102 entrant d ranks 1 with no previous rank
    assert(byKey((102, "d"))._4 == 1 && byKey((102, "d"))._5 == None)
    // c vanished after day 100: no 101/102 rows for it
    assert(!got.exists(r => r._2 == "c" && r._1 > 100))
  }

  test("tie ranks break by event_type, matching the batch contract") {
    val tie = Seq.fill(3)(DayTypeEvent(7, "x")) ++
      Seq.fill(3)(DayTypeEvent(7, "m")) ++ Seq.fill(1)(DayTypeEvent(7, "z"))
    val got = rows(StreamingTrending.leaderboard(
      streamed(Seq(tie), "trend_tie")))
    assert(got.map(r => (r._2, r._4)).toSeq ==
      Seq(("m", 1), ("x", 2), ("z", 3)))
  }

  test("adapter buckets timestamps to epoch days") {
    val df = Seq(
      ("2024-03-01 10:15:00", "a"), ("2024-03-01 23:59:59", "a"),
      ("2024-03-02 00:00:00", "b"))
      .toDF("ts", "event_type")
      .select(col("ts").cast("timestamp").as("ts"), col("event_type"))
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val query = StreamingTrending.counts(
        in.toDS().toDF("ts", "event_type"), "ts", "event_type")
      .writeStream.format("memory").queryName("trend_adapter")
      .outputMode("update").start()
    try {
      in.addData(df.as[(java.sql.Timestamp, String)].collect().toSeq: _*)
      query.processAllAvailable()
      val expectedDay = java.time.LocalDate.of(2024, 3, 1).toEpochDay.toInt
      val got = spark.table("trend_adapter")
        .withColumn("seq", monotonically_increasing_id())
        .groupBy("day", "event_type")
        .agg(max_by(col("n_events"), col("seq")).as("n"))
        .as[(Int, String, Long)].collect().toSet
      assert(got == Set((expectedDay, "a", 2L), (expectedDay + 1, "b", 1L)))
    } finally query.stop()
  }
}
