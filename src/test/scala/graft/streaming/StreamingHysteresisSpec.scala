package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Changepoint
import StreamingHysteresis.Tick

class StreamingHysteresisSpec extends SparkSuite {
  import spark.implicits._

  private val ticks: Seq[Tick] = {
    val a = Seq(5L, 9L, 8L, 4L, 3L, 9L, 2L).zipWithIndex.map {
      case (v, t) => Tick("a", t.toLong, v) }
    val b = Seq(1L, 100L, 50L, 0L).zipWithIndex.map {
      case (v, t) => Tick("b", t.toLong, v) }
    a ++ b
  }

  private def run(batches: Seq[Seq[Tick]])
      : (Set[(String, Long, Long, Long, Option[String])], Long) = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Tick]
    val name = s"hyst_${System.nanoTime()}"
    val q = StreamingHysteresis.alerts(in.toDS(), hi = 8L, lo = 3L)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      val rows = spark.table(name)
        .select($"key", $"t", $"v", $"alert", $"event", $"n_late")
        .as[(String, Long, Long, Long, Option[String], Long)]
        .collect().toSeq
      (rows.map(r => (r._1, r._2, r._3, r._4, r._5)).toSet,
        rows.map(_._6).max)
    } finally q.stop()
  }

  private def batchRows: Set[(String, Long, Long, Long, Option[String])] =
    Changepoint.hysteresis(
        ticks.toDF().select($"key", $"t", $"v"), "key", "t", "v", 8L, 3L)
      .as[(String, Long, Long, Long, Option[String])].collect().toSet

  test("in-order replay across micro-batch splits equals the batch rows") {
    val ordered = ticks.sortBy(t => (t.t, t.key))
    for (split <- Seq(Seq(ordered), Seq(ordered.take(4), ordered.drop(4)),
        ordered.grouped(1).toSeq)) {
      val (got, late) = run(split)
      assert(got == batchRows, s"split sizes ${split.map(_.size)}")
      assert(late == 0L)
    }
  }

  test("out-of-order ticks are counted and excluded, state unrevised") {
    val ordered = ticks.filter(_.key == "a")
    val late = Tick("a", 2L, 100L)  // would have raised at t=2
    val follow = Tick("a", 99L, 1L) // the meter rides the next emission
    val (got, nLate) = run(Seq(ordered, Seq(late), Seq(follow)))
    val want = Changepoint.hysteresis(
        (ordered :+ follow).toDF().select($"key", $"t", $"v"),
        "key", "t", "v", 8L, 3L)
      .as[(String, Long, Long, Long, Option[String])].collect().toSet
    assert(got == want)  // the late tick changed NO row
    assert(nLate == 1L)
  }

  test("state is one boolean: a raise survives an idle micro-batch") {
    val (got, _) = run(Seq(
      Seq(Tick("k", 0L, 99L)),
      Seq(Tick("z", 0L, 1L)),         // unrelated key in between
      Seq(Tick("k", 1L, 5L))))        // inside the band: stays up
    assert(got.contains(("k", 1L, 5L, 1L, None)))
  }
}
