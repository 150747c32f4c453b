package graft.operators

import java.sql.Timestamp

import graft.SparkSuite

class ResampleSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def run(rows: Seq[(String, Timestamp, Double)], step: Long) =
    Resample.interpolate(rows.toDF("key", "ts", "value"),
        "key", "ts", "value", step)
      .select($"key", $"ts", $"interp_micros", $"value")
      .as[(String, Timestamp, Long, Double)].collect()
      .sortBy(r => (r._1, r._2.getTime)).toSeq

  test("midpoints, exact hits, and truncation follow the weighted form") {
    // obs at :00 (v=1), :30 (v=4); 15-min grid
    val rows = Seq(
      ("a", ts("2024-01-01 00:00:00"), 1.0),
      ("a", ts("2024-01-01 00:30:00"), 4.0))
    val got = run(rows, 900L)
    assert(got == Seq(
      ("a", ts("2024-01-01 00:00:00"), 1000000L, 1.0),   // exact hit
      ("a", ts("2024-01-01 00:15:00"), 2500000L, 2.5),   // midpoint
      ("a", ts("2024-01-01 00:30:00"), 4000000L, 4.0)))  // exact hit
  }

  test("falling series stays exact (the negative-delta case the weighted form absorbs)") {
    val rows = Seq(
      ("a", ts("2024-01-01 00:00:00"), 10.0),
      ("a", ts("2024-01-01 00:45:00"), 1.0))
    val got = run(rows, 900L)
    // weighted form: (10e6*(2700-900) + 1e6*900) div 2700 = 7e6 at :15
    assert(got.map(_._3) == Seq(10000000L, 7000000L, 4000000L, 1000000L))
  }

  test("uneven gaps interpolate against the bracketing pair only") {
    val rows = Seq(
      ("a", ts("2024-01-01 00:00:00"), 0.0),
      ("a", ts("2024-01-01 00:10:00"), 6.0),   // off-grid observation
      ("a", ts("2024-01-01 00:30:00"), 0.0))
    val got = run(rows, 900L)
    // :15 sits between :10 (6.0) and :30 (0.0): 6e6*(1800-900)... =
    // (6e6 * (1800-900) + 0) div (1800 - 600) = wait, in seconds:
    // pus=600s, nus=1800s, t=900s -> (6e6*900 + 0*300) div 1200 = 4.5e6
    assert(got == Seq(
      ("a", ts("2024-01-01 00:00:00"), 0L, 0.0),
      ("a", ts("2024-01-01 00:15:00"), 4500000L, 4.5),
      ("a", ts("2024-01-01 00:30:00"), 0L, 0.0)))
  }

  test("keys are independent; sub-step spans vanish instead of reversing") {
    val rows = Seq(
      ("a", ts("2024-01-01 00:00:00"), 1.0),
      ("a", ts("2024-01-01 00:15:00"), 2.0),
      // span (00:01, 00:14) contains no grid tick at 900s
      ("b", ts("2024-01-01 00:01:00"), 5.0),
      ("b", ts("2024-01-01 00:14:00"), 6.0))
    val got = run(rows, 900L)
    assert(got.map(_._1).toSet == Set("a"))
    assert(got.size == 2)
  }

  test("duplicate same-instant observations resolve to the minimum") {
    val rows = Seq(
      ("a", ts("2024-01-01 00:00:00"), 3.0),
      ("a", ts("2024-01-01 00:00:00"), 7.0),
      ("a", ts("2024-01-01 00:15:00"), 3.0))
    val got = run(rows, 900L)
    assert(got.head._3 == 3000000L)
  }

  test("pre-1970 timestamps: floor bounds, no ghost tick past the last obs") {
    // us in [-1000s, -100s]: grid ticks at -900s only (step 900s);
    // truncating div used to emit a ghost tick at 0 with NULL value
    val rows = Seq(
      ("a", new Timestamp(-1000L * 1000), 0.0),
      ("a", new Timestamp(-100L * 1000), 9.0))
    val got = run(rows, 900L)
    assert(got.size == 1)
    val (_, tick, micros, _) = got.head
    assert(tick.getTime == -900L * 1000)
    // linear between (-1000s, 0) and (-100s, 9e6): at -900s ->
    // 9e6 * 100/900 div = (0*(800e6) + 9e6*(100e6)) div 900e6 = 1e6
    assert(micros == 1000000L)
  }

  test("negative values raise loudly") {
    val rows = Seq(
      ("a", ts("2024-01-01 00:00:00"), -1.0),
      ("a", ts("2024-01-01 00:15:00"), 1.0))
    val e = intercept[Exception] {
      run(rows, 900L)
    }
    assert(e.getMessage.contains("negative value") ||
      Option(e.getCause).exists(_.getMessage.contains("negative value")))
  }
}
