package graft.operators

import java.sql.Timestamp

import graft.SparkSuite

class AsofJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("left as-of join picks the latest right row at or before left ts") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (2L, ts("2024-01-01 10:30:00"), 200.0))
      .toDF("q_key", "q_ts", "price")
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 10:30:00")), // after 10:00 quote
      (11L, 1L, ts("2024-01-01 11:00:00")), // exactly at 11:00 -> inclusive
      (12L, 1L, ts("2024-01-01 09:00:00")), // before any quote -> null
      (13L, 2L, ts("2024-01-01 12:00:00")),
      (14L, 3L, ts("2024-01-01 12:00:00"))) // key with no quotes -> null
      .toDF("trade_id", "t_key", "t_ts")

    val out = AsofJoin.leftAsof(trades, quotes,
        leftKey = "t_key", rightKey = "q_key",
        leftTs = "t_ts", rightTs = "q_ts", rightTieBreak = "price")
      .collect()
      .map(r => r.getAs[Long]("trade_id") ->
        (if (r.isNullAt(r.fieldIndex("price"))) None
         else Some(r.getAs[Double]("price"))))
      .toMap

    assert(out(10L) == Some(100.0))
    assert(out(11L) == Some(110.0))
    assert(out(12L) == None)
    assert(out(13L) == Some(200.0))
    assert(out(14L) == None)
    assert(out.size == 5)
  }

  test("duplicate left timestamps each get the same match") {
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 7.5))
      .toDF("r_key", "r_ts", "price")
    val left = Seq(
      (100L, 1L, ts("2024-01-01 10:00:00")),
      (101L, 1L, ts("2024-01-01 10:00:00")))
      .toDF("l_id", "l_key", "l_ts")
    val out = AsofJoin.leftAsof(left, right,
        "l_key", "r_key", "l_ts", "r_ts", rightTieBreak = "price")
      .collect()
    assert(out.length == 2 && out.forall(_.getAs[Double]("price") == 7.5))
  }

  test("matched right row with NULL payload fields is carried atomically") {
    // the 11:00 quote legitimately has a null venue; a per-column fill
    // would backfill venue from the older 10:00 row, emitting a
    // composite right row that never existed
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some("NYSE"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), None, 110.0))
      .toDF("q_key", "q_ts", "venue", "price")
    val trades = Seq((10L, 1L, ts("2024-01-01 11:30:00")))
      .toDF("trade_id", "t_key", "t_ts")
    val out = AsofJoin.leftAsof(trades, quotes,
        "t_key", "q_key", "t_ts", "q_ts", rightTieBreak = "price")
      .collect().head
    assert(out.getAs[Double]("price") == 110.0)
    assert(out.isNullAt(out.fieldIndex("venue")),
      s"venue backfilled from an older right row: ${out.getAs[String]("venue")}")
  }

  test("ties on (key, ts) resolve to the greatest tie-break") {
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5L),
      (1L, ts("2024-01-01 10:00:00"), 9L))
      .toDF("r_key", "r_ts", "r_id")
    val left = Seq((100L, 1L, ts("2024-01-01 10:30:00")))
      .toDF("l_id", "l_key", "l_ts")
    val out = AsofJoin.leftAsof(left, right,
        "l_key", "r_key", "l_ts", "r_ts", rightTieBreak = "r_id")
      .collect().head
    assert(out.getAs[Long]("r_id") == 9L)
  }
}
