package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite

class IntervalJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("matches exactly the pairs inside the forward window, once each") {
    val clicks = Seq((1L, 10L, ts(100)), (1L, 11L, ts(200)), (2L, 12L, ts(100)))
      .toDF("user_id", "click_id", "click_ts")
    val buys = Seq(
      (1L, 20L, ts(100)),  // delta 0 from click 10
      (1L, 21L, ts(160)),  // delta 60 from click 10 (boundary, kept)
      (1L, 22L, ts(161)),  // delta 61 from click 10 (out); -39 from 11 (out)
      (1L, 23L, ts(260)),  // delta 60 from click 11
      (2L, 24L, ts(99)))   // before the click (out)
      .toDF("user_id", "buy_id", "buy_ts")
    val out = IntervalJoin.forwardWindow(clicks, buys, "user_id",
        "click_ts", "buy_ts", 60L * 1000000L)
      .select("click_id", "buy_id", "delta_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(
      (10L, 20L, 0L),
      (10L, 21L, 60000000L),
      (11L, 23L, 60000000L)))
  }

  test("agrees with the naive per-key cross join on real events") {
    val e = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val clicks = e.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"ts".as("click_ts"))
    val buys = e.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("buy_id"), $"ts".as("buy_ts"))
    val w = 3600L * 1000000L
    val fast = IntervalJoin.forwardWindow(clicks, buys, "user_id",
      "click_ts", "buy_ts", w).select("click_id", "buy_id")
    val naive = clicks.join(buys, "user_id")
      .filter(unix_micros($"buy_ts") >= unix_micros($"click_ts") &&
        unix_micros($"buy_ts") - unix_micros($"click_ts") <= w)
      .select("click_id", "buy_id")
    assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty)
    assert(fast.count() == naive.count()) // exactly-once emission
  }
}
