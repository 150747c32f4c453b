package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite

class ChangepointSpec extends SparkSuite {
  import spark.implicits._

  /** The textbook sequential recurrence the closed form must equal. */
  private def referenceCusum(xs: Seq[Long], k: Long): Seq[Long] =
    xs.scanLeft(0L)((s, x) => math.max(0L, s + x - k)).tail

  test("cusumSeries equals the sequential max(0, s + x - k) recurrence") {
    val xs = Seq(5L, 9L, 2L, 14L, 14L, 1L, 0L, 20L, 8L, 8L, 8L)
    val df = xs.zipWithIndex
      .map { case (x, i) => ("k1", i.toLong, x) }
      .toDF("key", "bucket", "x")
    val out = Changepoint.cusumSeries(df, "key", "bucket", "x",
        allowance = 7L, threshold = 10L)
      .orderBy("bucket")
      .select("cusum").as[Long].collect().toSeq
    assert(out == referenceCusum(xs, 7L))
  }

  test("alarm fires exactly where the recurrence reaches the threshold") {
    val xs = Seq(10L, 10L, 3L, 3L, 3L, 12L)
    val df = xs.zipWithIndex
      .map { case (x, i) => ("k1", i.toLong, x) }
      .toDF("key", "bucket", "x")
    val out = Changepoint.cusumSeries(df, "key", "bucket", "x", 7L, 5L)
      .orderBy("bucket").select("cusum", "alarm")
      .as[(Long, Int)].collect().toSeq
    val expected = referenceCusum(xs, 7L).map(s => (s, if (s >= 5L) 1 else 0))
    assert(out == expected)
  }

  test("keys are independent and the reset (max with 0) actually resets") {
    val rows = Seq(
      ("a", 0L, 20L), ("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 20L),
      ("b", 0L, 1L), ("b", 1L, 1L))
    val out = Changepoint
      .cusumSeries(rows.toDF("key", "bucket", "x"), "key", "bucket", "x", 7L, 10L)
      .orderBy("key", "bucket")
      .select("key", "cusum").as[(String, Long)].collect().toSeq
    // a: 13, max(0,13-7)=6, max(0,6-7)=0, 13 ; b: 0, 0
    assert(out == Seq(("a", 13L), ("a", 6L), ("a", 0L), ("a", 13L),
      ("b", 0L), ("b", 0L)))
  }

  private def ev(host: Long, day: Int, n: Int) =
    (0 until n).map(i =>
      (host, new Timestamp(day * 86400000L + i * 1000L)))

  test("trendEvents recovers an exact linear ramp") {
    // host 1: daily counts 2,4,6,8 -> slope 2, intercept 2
    // host 2: constant 5 -> slope 0, intercept 5
    val rows = (ev(1L, 0, 2) ++ ev(1L, 1, 4) ++ ev(1L, 2, 6) ++ ev(1L, 3, 8) ++
      (0 until 3).flatMap(d => ev(2L, d, 5)))
      .toDF("host", "ts")
    val out = Changepoint.trendEvents(rows, "host", "ts", 86400L)
      .orderBy("host")
      .select("host", "n_buckets", "slope", "intercept")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq((1L, 4L, 2.0, 2.0), (2L, 3L, 0.0, 5.0)))
  }

  test("trendEvents drops single-bucket keys (undefined slope)") {
    val rows = (ev(1L, 0, 3) ++ ev(2L, 0, 2) ++ ev(2L, 1, 4)).toDF("host", "ts")
    val out = Changepoint.trendEvents(rows, "host", "ts", 86400L)
      .select("host").as[Long].collect().toSeq
    assert(out == Seq(2L))
  }

  test("burstStats: islands split on missing AND below-threshold buckets") {
    // key a, hourly buckets: counts 3,3 at h0,h1 (burst), h2 silent,
    // count 1 at h3 (below thr=2), 2,2,2 at h4..h6 (burst len 3)
    def evs(h: Int, n: Int) =
      (0 until n).map(i => ("a", new Timestamp(h * 3600000L + i)))
    val rows = (evs(0, 3) ++ evs(1, 3) ++ evs(3, 1) ++
      evs(4, 2) ++ evs(5, 2) ++ evs(6, 2)).toDF("key", "ts")
    val out = Changepoint.burstStats(rows, "key", "ts", 3600L, 2L)
      .select("key", "n_bursts", "longest_burst", "burst_buckets",
        "first_burst_bucket")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("a", 2L, 3L, 5L, 0L)))
  }

  test("burstStats: keys with no qualifying bucket emit nothing") {
    val rows = (0 until 5).map(i => ("b", new Timestamp(i * 3600000L)))
      .toDF("key", "ts")
    assert(Changepoint.burstStats(rows, "key", "ts", 3600L, 2L).count() == 0)
  }

  test("concentration: hand-computed HHI for single-source vs uniform") {
    // net A: one host sends everything -> HHI 1.0, top_share 1.0
    // net B: 4 hosts x 5 events -> HHI = 4*(5/20)^2 = 0.25, top 0.25
    val rows = ((0 until 10).map(_ => ("A", "h1")) ++
      (for (h <- 1 to 4; _ <- 1 to 5) yield ("B", s"h$h")))
      .toDF("key", "src")
    val out = Changepoint.concentration(rows, "key", "src")
      .orderBy("key")
      .select("key", "n_sources", "n_events", "hhi", "top_share")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq(("A", 1L, 10L, 1.0, 1.0), ("B", 4L, 20L, 0.25, 0.25)))
  }

  test("trend x offsets are per-key relative (absolute epoch never enters)") {
    // identical ramp placed at two distant epochs must fit identically
    val early = (ev(1L, 0, 1) ++ ev(1L, 1, 2) ++ ev(1L, 2, 3)).toDF("host", "ts")
    val late = (ev(2L, 10000, 1) ++ ev(2L, 10001, 2) ++ ev(2L, 10002, 3))
      .toDF("host", "ts")
    val out = Changepoint.trendEvents(early.union(late), "host", "ts", 86400L)
      .select("slope", "intercept").distinct()
      .as[(Double, Double)].collect().toSeq
    assert(out == Seq((1.0, 1.0)))
  }

  test("heavyChange ranks ramps, new talkers, and gone-silent keys by |delta|") {
    val end = Timestamp.valueOf("2024-03-02 00:00:00")
    def at(hoursBack: Int) =
      new Timestamp(end.getTime - hoursBack * 3600000L)
    // windows at w = 1 day: cur = (end-24h, end], prev = (end-48h, end-24h]
    val rows =
      Seq.fill(10)(("ramp", at(2))) ++ Seq.fill(2)(("ramp", at(30))) ++   // +8
      Seq.fill(5)(("new", at(3))) ++                                      // +5
      Seq.fill(7)(("gone", at(40))) ++                                    // -7
      Seq.fill(4)(("flat", at(4))) ++ Seq.fill(4)(("flat", at(28))) ++    // 0
      Seq.fill(9)(("old", at(60)))   // outside both windows: excluded
    val out = Changepoint.heavyChange(
        rows.toDF("key", "ts"), "key", "ts",
        windowSeconds = 86400L, topK = 3)
      .select($"rnk", $"key", $"n_cur", $"n_prev", $"delta", $"ratio")
      .as[(Int, String, Long, Long, Long, Double)].collect().toSeq
      .sortBy(_._1)
    assert(out == Seq(
      (1, "ramp", 10L, 2L, 8L, math.rint(10.0 / 3.0 * 1e6) / 1e6),
      (2, "gone", 0L, 7L, -7L, 0.0),
      (3, "new", 5L, 0L, 5L, 5.0)))
  }

  test("heavyChange tie-breaks equal |delta| by key and respects topK") {
    val end = Timestamp.valueOf("2024-03-02 00:00:00")
    def at(hoursBack: Int) =
      new Timestamp(end.getTime - hoursBack * 3600000L)
    val rows = Seq.fill(3)(("b", at(1))) ++ Seq.fill(3)(("a", at(1))) ++
      Seq(("z", at(1)), ("z", at(30)), ("z", at(31)))  // anchor max ts
    val out = Changepoint.heavyChange(rows.toDF("key", "ts"), "key", "ts",
        86400L, topK = 2)
      .select($"rnk", $"key", $"delta")
      .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)
    assert(out == Seq((1, "a", 3L), (2, "b", 3L)))
  }

  /** Driver-side reference: the sequential hysteresis state machine
    * the LOCF window must equal.
    */
  private def refHysteresis(vals: Seq[Long], hi: Long,
      lo: Long): Seq[(Long, Option[String])] = {
    var alert = false
    vals.map { v =>
      val next = if (alert) v > lo else v > hi
      val event =
        if (next && !alert) Some("raise")
        else if (!next && alert) Some("clear")
        else None
      alert = next
      (if (alert) 1L else 0L, event)
    }
  }

  private def runHysteresis(vals: Seq[Long], hi: Long,
      lo: Long): Seq[(Long, Option[String])] = {
    val rows = vals.zipWithIndex.map { case (v, t) => ("k", t.toLong, v) }
    Changepoint.hysteresis(rows.toDF("key", "t", "v"), "key", "t", "v",
        hi, lo)
      .orderBy("t")
      .select($"alert", $"event")
      .as[(Long, Option[String])].collect().toSeq
  }

  test("hysteresis: oscillation inside (lo, hi] never flaps") {
    // raise at 9 (>8), wobble 4..8 stays up, clear at 3 (<=3),
    // wobble 4..8 stays DOWN (no raise without crossing hi)
    val vals = Seq(5L, 9L, 8L, 4L, 7L, 3L, 5L, 8L, 4L, 9L)
    val got = runHysteresis(vals, hi = 8L, lo = 3L)
    assert(got == refHysteresis(vals, 8L, 3L))
    assert(got.map(_._1) == Seq(0L, 1L, 1L, 1L, 1L, 0L, 0L, 0L, 0L, 1L))
    assert(got.flatMap(_._2) == Seq("raise", "clear", "raise"))
  }

  test("hysteresis: boundary semantics — raise strictly above hi, clear at lo") {
    // v == hi never raises; v == lo clears
    val vals = Seq(8L, 8L, 9L, 3L, 3L)
    val got = runHysteresis(vals, 8L, 3L)
    assert(got == refHysteresis(vals, 8L, 3L))
    assert(got.map(_._1) == Seq(0L, 0L, 1L, 0L, 0L))
  }

  test("hysteresis: first tick can raise; keys are independent") {
    val rows = Seq(("a", 0L, 99L), ("a", 1L, 5L), ("b", 0L, 1L))
    val got = Changepoint.hysteresis(rows.toDF("key", "t", "v"),
        "key", "t", "v", hi = 8L, lo = 3L)
      .as[(String, Long, Long, Long, Option[String])].collect().toSet
    assert(got == Set(
      ("a", 0L, 99L, 1L, Some("raise")),
      ("a", 1L, 5L, 1L, None),
      ("b", 0L, 1L, 0L, None)))
  }

  test("hysteresis: matches the state machine on a long pseudo-random series") {
    val vals = (0 until 300).map(i => ((i * 37 + i * i * 13) % 17).toLong)
    assert(runHysteresis(vals, hi = 12L, lo = 4L) ==
      refHysteresis(vals, 12L, 4L))
  }

  test("hysteresis: rejects lo >= hi") {
    intercept[IllegalArgumentException] {
      Changepoint.hysteresis(Seq(("k", 0L, 1L)).toDF("key", "t", "v"),
        "key", "t", "v", hi = 3L, lo = 3L)
    }
  }
}
