package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.operators.Cdc
import StreamingScd2.{ClosedInterval, ScdEvent}

class StreamingScd2Spec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def us(s: String) = ts(s).getTime * 1000L

  private def run(batches: Seq[Seq[ScdEvent]], name: String)
      : Seq[ClosedInterval] = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[ScdEvent]
    val query = StreamingScd2.intervals(in.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); query.processAllAvailable() }
      spark.table(name).as[ClosedInterval].collect().toSeq
        .sortBy(c => (c.key, c.valid_from_us))
    } finally query.stop()
  }

  test("closed intervals equal the batch scd2's non-current rows on replay") {
    val rows = Seq(
      ("u1", "2024-01-01 00:00:00", 1L, "free"),
      ("u1", "2024-01-02 00:00:00", 2L, "free"),   // no-op
      ("u1", "2024-01-03 00:00:00", 3L, "pro"),
      ("u1", "2024-01-04 00:00:00", 4L, "free"),
      ("u2", "2024-01-01 12:00:00", 5L, "pro"),
      ("u2", "2024-01-05 00:00:00", 6L, "max"))
    val batch = Cdc.scd2(
        rows.map { case (k, t, i, v) => (k, ts(t), i, v) }
          .toDF("user", "ts", "seq", "plan"),
        "user", "ts", "seq", Seq("plan"))
      .filter("is_current = 0")
      .select("user", "plan", "valid_from", "valid_to")
      .as[(String, String, Timestamp, Timestamp)].collect().toSeq
      .map { case (k, v, f, t) =>
        (k, Some(v), f.getTime * 1000L, t.getTime * 1000L) }
      .sortBy(c => (c._1, c._3))

    val events = rows.map { case (k, t, i, v) =>
      ScdEvent(k, us(t), i, Some(v)) }
    // split mid-key: interval state must survive batch boundaries
    val streamed = run(Seq(events.take(3), events.drop(3)), "scd_parity")
    assert(streamed.map(c =>
      (c.key, c.value, c.valid_from_us, c.valid_to_us)) == batch)
    assert(streamed.forall(_.n_late == 0L))
  }

  test("NULL is a real state; late rows count without rewriting history") {
    val events = Seq(
      ScdEvent("k", us("2024-01-01 00:00:00"), 1L, Some("a")),
      ScdEvent("k", us("2024-01-02 00:00:00"), 2L, None),
      ScdEvent("k", us("2024-01-03 00:00:00"), 3L, None),   // collapse
      ScdEvent("k", us("2024-01-04 00:00:00"), 4L, Some("a")))
    val late = Seq(
      ScdEvent("k", us("2024-01-03 12:00:00"), 9L, Some("z")))
    val streamed = run(Seq(events, late), "scd_null")
    assert(streamed.map(_.value) == Seq(Some("a"), None))
    // the late row (before the open interval's start) was excluded;
    // its count rides on the NEXT emitted interval
    val after = run(Seq(events, late,
      Seq(ScdEvent("k", us("2024-01-05 00:00:00"), 10L, Some("b")))),
      "scd_late")
    assert(after.last.n_late == 1L && after.last.value == Some("a"))
  }

  test("late event between open start and a collapsed repeat is late") {
    // a@01-01 opens; a@01-03 collapses as a no-op but ADVANCES the
    // seen-watermark; z@01-02 sits between the open start and that
    // watermark — it must be classified late, not folded in-order
    // (folding would close [01-01, 01-02) and rewrite history)
    val events = Seq(
      ScdEvent("k", us("2024-01-01 00:00:00"), 1L, Some("a")),
      ScdEvent("k", us("2024-01-03 00:00:00"), 2L, Some("a")))
    val late = Seq(
      ScdEvent("k", us("2024-01-02 00:00:00"), 9L, Some("z")),
      // exact duplicate of an observed (ts, tie): also late
      ScdEvent("k", us("2024-01-03 00:00:00"), 2L, Some("a")))
    val fin = Seq(
      ScdEvent("k", us("2024-01-05 00:00:00"), 10L, Some("b")))
    val streamed = run(Seq(events, late, fin), "scd_between")
    assert(streamed.map(c =>
      (c.value, c.valid_from_us, c.valid_to_us, c.n_late)) == Seq(
      (Some("a"), us("2024-01-01 00:00:00"), us("2024-01-05 00:00:00"), 2L)))
  }
}
