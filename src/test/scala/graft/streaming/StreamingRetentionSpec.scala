package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import StreamingRetention.ActivityEvent

class StreamingRetentionSpec extends SparkSuite {
  import spark.implicits._

  private def usOf(day: Long, h: Long = 12L): Long =
    (day * 24 + h) * 3600000000L

  private def streamed(batches: Seq[Seq[ActivityEvent]], name: String)
      : Map[Long, (Long, Long, Long)] = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[ActivityEvent]
    val query = StreamingRetention.perUser(in.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      batches.foreach { b => in.addData(b: _*); query.processAllAvailable() }
      spark.table(name)
        .withColumn("seq", monotonically_increasing_id())
        .groupBy("user_id")
        .agg(max_by(struct(col("cohort_week_us"), col("week_mask"),
          col("n_lost")), col("seq")).as("r"))
        .select(col("user_id"), col("r.cohort_week_us"), col("r.week_mask"),
          col("r.n_lost"))
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    } finally query.stop()
  }

  test("the mask-derived table equals the batch retention report, any order") {
    // 30 users, activity weeks scattered 0..20, events deliberately
    // SHUFFLED across batches (order-free exactness is the claim)
    val evs = new scala.util.Random(42).shuffle(
      (for (u <- 0L until 30L; w <- 0 until 21
            if (u * 31 + w * 17) % 5 < 2)
        yield ActivityEvent(u, usOf(w * 7 + (u % 5), u % 23))).toList)
    val got = streamed(
      Seq(evs.take(40), evs.slice(40, 41), evs.drop(41)), "ret_stream")
    assert(got.values.forall(_._3 == 0L), "all activity inside the horizon")

    // streamed table: explode set bits of the latest mask per user
    val table = got.toSeq.toDF("user_id", "r")
      .select(expr("timestamp_micros(r._1)").as("cohort_week"),
        explode(expr(
          "filter(transform(sequence(0, 63), k -> " +
            "IF(((r._2 >> k) & 1) = 1, k, -1)), k -> k >= 0)")).as("week_k"))
      .groupBy("cohort_week", "week_k")
      .agg(count(lit(1)).as("n_users"))
      .as[(java.sql.Timestamp, Int, Long)].collect()
      .map(r => (r._1.getTime, r._2.toLong) -> r._3).toMap

    // the batch A26a formula verbatim over the same events
    val weeks = evs.toDF("user_id", "tsUs")
      .withColumn("ts", expr("timestamp_micros(tsUs)"))
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .distinct()
    val cohorts = weeks.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    val batch = weeks.join(cohorts, "user_id")
      .select(col("cohort_week"),
        expr("datediff(week, cohort_week) DIV 7").cast("long").as("week_k"))
      .groupBy(col("cohort_week"), col("week_k"))
      .agg(count(lit(1)).as("n_users"))
      .as[(java.sql.Timestamp, Long, Long)].collect()
      .map(r => (r._1.getTime, r._2) -> r._3).toMap

    assert(table.nonEmpty && table == batch)
  }

  test("an out-of-order earlier week re-bases the cohort exactly") {
    val b1 = Seq(ActivityEvent(1L, usOf(14)), ActivityEvent(1L, usOf(21)))
    val b2 = Seq(ActivityEvent(1L, usOf(0))) // two weeks before the cohort
    val got = streamed(Seq(b1, b2), "ret_rebase")
    val (cohortUs, mask, lost) = got(1L)
    assert(cohortUs == StreamingRetention.weekStartUs(
      StreamingRetention.weekIdx(usOf(0))))
    // offsets after re-base: week0 -> bit 0, week2 -> bit 2, week3 -> bit 3
    assert(mask == ((1L << 0) | (1L << 2) | (1L << 3)) && lost == 0L)
  }

  test("activity past the 64-week horizon ticks the meter, never corrupts") {
    val got = streamed(Seq(Seq(
      ActivityEvent(1L, usOf(0)),
      ActivityEvent(1L, usOf(64L * 7)), // offset 64: beyond
      ActivityEvent(1L, usOf(7)))), "ret_horizon")
    val (_, mask, lost) = got(1L)
    assert(mask == ((1L << 0) | (1L << 1)) && lost == 1L)
    // and a deep re-base pushing tracked weeks out also ticks it
    val got2 = streamed(Seq(
      Seq(ActivityEvent(2L, usOf(63L * 7)), ActivityEvent(2L, usOf(62L * 7))),
      Seq(ActivityEvent(2L, usOf(0)))), "ret_deep")
    val (c2, m2, l2) = got2(2L)
    assert(c2 == StreamingRetention.weekStartUs(
      StreamingRetention.weekIdx(usOf(0))))
    assert(m2 == ((1L << 0) | (1L << 62) | (1L << 63)) && l2 == 0L)
  }
}
