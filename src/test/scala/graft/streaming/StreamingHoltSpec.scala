package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.operators.Baseline
import StreamingEwma.Tick
import StreamingHolt.NetworkHolt

class StreamingHoltSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Driver-side reference: the batch kernel's sequential fold. */
  private def refFold(xs: Seq[Long]): (Long, Long) = {
    var s = xs.head; var b = 0L
    xs.tail.foreach { x =>
      val s2 = math.floor((x + s + b) / 2.0).toLong
      b = math.floor((s2 - s + b) / 2.0).toLong
      s = s2
    }
    (s, b)
  }

  private def run(batches: Seq[Seq[Tick]], name: String)
      : Map[String, NetworkHolt] = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Tick]
    val query = StreamingHolt.perNetwork(in.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      batches.foreach { b => in.addData(b: _*); query.processAllAvailable() }
      import org.apache.spark.sql.functions._
      spark.table(name)
        .withColumn("seq", monotonically_increasing_id())
        .groupBy("network")
        .agg(max_by(struct(col("last_hour"), col("level"), col("trend"),
          col("forecast"), col("n_late")), col("seq")).as("e"))
        .select(col("network"), col("e.last_hour"), col("e.level"),
          col("e.trend"), col("e.forecast"), col("e.n_late"))
        .as[NetworkHolt].collect().map(r => r.network -> r).toMap
    } finally query.stop()
  }

  test("in-order replay equals the batch kernel, across hour-splitting batches") {
    // hourly counts 2, 8, 13, 1 on one /24 (all events at :30 so the
    // batch's anchored buckets coincide with absolute hours)
    val hours = Seq(2L, 8L, 13L, 1L)
    val events = hours.zipWithIndex.flatMap { case (n, h) =>
      Seq.fill(n.toInt)((s"10.1.2.${h + 1}",
        ts(f"2024-01-10 0${9 + h}%d:30:00"), 1.0))
    } ++ Seq(
      // a second /24 that APPEARS MID-WINDOW (hours 2, 3 only): the
      // trimmed batch spine must init at ITS first hour, matching the
      // streaming twin which cannot know the window anchor (the r10
      // review finding)
      ("10.9.9.1", ts("2024-01-10 11:30:00"), 1.0),
      ("10.9.9.1", ts("2024-01-10 11:30:00"), 1.0),
      ("10.9.9.2", ts("2024-01-10 12:30:00"), 1.0))
    val batch = Baseline.holtForecast(events.toDF("host", "ts", "value"),
        "host", "ts", windowHours = 4, prefix = 24, horizonHours = 1)
      .orderBy("network")
      .as[(String, Long, Long, Long, Long)].collect().toSeq

    val ticks = StreamingEwma.ticks(events.toDF("host", "ts", "value"),
      "host", "ts", 24).collect().toSeq.sortBy(t => (t.hourIdx, t.network))
    // split mid-hour-2 AND mid-hour-3: same-hour accumulation across
    // batch boundaries must not re-fold the recurrence
    val streamedAll = run(Seq(ticks.take(5), ticks.slice(5, 17),
      ticks.drop(17)), "holt_parity")
    val streamed = streamedAll("10.1.2.0")
    assert((streamed.level, streamed.trend) == refFold(hours))
    val b1 = batch.find(_._1 == "10.1.2.0").get
    assert(streamed.level == b1._2 && streamed.trend == b1._3 &&
      streamed.forecast == b1._4)
    assert(streamed.n_late == 0L)
    val late2 = streamedAll("10.9.9.0")
    val b2 = batch.find(_._1 == "10.9.9.0").get
    assert((late2.level, late2.trend) == refFold(Seq(2L, 1L)))
    assert(late2.level == b2._2 && late2.trend == b2._3)
  }

  test("gap hours decay via the zero recurrence; long gaps hit the fixpoint") {
    val t0 = Tick("n", 100L)
    val burst = Seq.fill(40)(t0)
    // 3-hour gap: reference folds [40, 0, 0, 5]
    val after = Seq(Tick("n", 103L), Tick("n", 103L), Tick("n", 103L),
      Tick("n", 103L), Tick("n", 103L))
    val got = run(Seq(burst, after), "holt_gap")("n")
    assert((got.level, got.trend) == refFold(Seq(40L, 0L, 0L, 5L)))
    // 200-hour gap from a positive state: the zero map's attractor
    val far = run(Seq(burst, Seq(Tick("n", 300L))), "holt_far")("n")
    val expected = {
      var st = (40L, 0L)
      (0 until 128).foreach { _ =>
        st = StreamingHolt.step(st._1, st._2, 0L) }
      StreamingHolt.step(st._1, st._2, 1L)
    }
    assert((far.level, far.trend) == expected)
  }

  test("late rows are counted and excluded, never folded out of order") {
    val inOrder = Seq(Tick("n", 10L), Tick("n", 10L), Tick("n", 11L))
    val late = Seq(Tick("n", 9L), Tick("n", 9L))
    val got = run(Seq(inOrder, late), "holt_late")("n")
    val clean = run(Seq(inOrder), "holt_clean")("n")
    assert(got.n_late == 2L)
    assert((got.level, got.trend) == (clean.level, clean.trend))
  }
}
