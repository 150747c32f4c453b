package graft.operators

import java.sql.Timestamp

import graft.SparkSuite

class HoppingSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Brute-force reference: every epoch-aligned window [ws, ws+size)
    * containing the event, via driver-side arithmetic.
    */
  private def reference(rows: Seq[(Timestamp, String, Double)],
      size: Long, slide: Long): Map[(Long, String), (Long, Double)] =
    rows.flatMap { case (t, k, v) =>
      val us = t.getTime * 1000L
      val slideUs = slide * 1000000L
      val base = us / slideUs
      (0L until (size / slide)).map { j =>
        ((base - j) * slideUs, k) -> (1L, v)
      }
    }.groupBy(_._1).map { case (wk, vs) =>
      wk -> (vs.map(_._2._1).sum,
        math.rint(vs.map(_._2._2).sum * 100) / 100)
    }

  test("each event lands in exactly size/slide windows; counts and sums match") {
    val rows = Seq(
      (ts("2024-01-01 00:00:00"), "a", 1.5),   // exactly on a boundary
      (ts("2024-01-01 00:14:59"), "a", 2.25),
      (ts("2024-01-01 00:15:00"), "b", 4.0),   // boundary again
      (ts("2024-01-01 00:59:59"), "a", 8.0),
      (ts("2024-01-01 02:30:07"), "b", 16.0))
    val out = Hopping.hopAgg(rows.toDF("ts", "key", "value"),
        "ts", "key", "value", 3600L, 900L)
      .select($"ws", $"we", $"key", $"n", $"sum_value")
      .as[(Timestamp, Timestamp, String, Long, Double)].collect()
    val got = out.map { case (ws, we, k, n, s) =>
      assert(we.getTime - ws.getTime == 3600L * 1000)
      ((ws.getTime * 1000L, k), (n, s))
    }.toMap
    assert(got == reference(rows, 3600L, 900L))
    // spot check: the boundary event at 00:15 covers starts
    // 23:30, 23:45, 00:00, 00:15 (inclusive start)
    val bStarts = out.filter(_._3 == "b").map(_._1.toString).sorted.toSeq
    assert(bStarts.take(4) == Seq("2023-12-31 23:30:00.0",
      "2023-12-31 23:45:00.0", "2024-01-01 00:00:00.0",
      "2024-01-01 00:15:00.0"))
  }

  test("tumbling is the slide == size special case") {
    val rows = Seq(
      (ts("2024-01-01 00:10:00"), "a", 1.0),
      (ts("2024-01-01 00:50:00"), "a", 2.0),
      (ts("2024-01-01 01:10:00"), "a", 4.0))
    val out = Hopping.hopAgg(rows.toDF("ts", "key", "value"),
        "ts", "key", "value", 3600L, 3600L)
      .select($"ws", $"n", $"sum_value")
      .as[(Timestamp, Long, Double)].collect().sortBy(_._1.getTime)
    assert(out.toSeq == Seq(
      (ts("2024-01-01 00:00:00"), 2L, 3.0),
      (ts("2024-01-01 01:00:00"), 1L, 4.0)))
  }

  test("non-divisor slide is rejected") {
    val df = Seq((ts("2024-01-01 00:00:00"), "a", 1.0))
      .toDF("ts", "key", "value")
    intercept[IllegalArgumentException] {
      Hopping.hopAgg(df, "ts", "key", "value", 3600L, 700L)
    }
  }
}
