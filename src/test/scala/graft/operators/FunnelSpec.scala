package graft.operators

import java.sql.Timestamp

import graft.SparkSuite

class FunnelSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("strict ordering: out-of-order completions do not convert") {
    val events = Seq(
      // user 1 completes the whole funnel in order
      (1L, "signup", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 01:00:00")),
      (1L, "purchase", ts("2024-01-01 02:00:00")),
      // user 2 purchases BEFORE clicking -> stops at signup>click
      (2L, "signup", ts("2024-01-01 00:00:00")),
      (2L, "purchase", ts("2024-01-01 00:30:00")),
      (2L, "click", ts("2024-01-01 01:00:00")),
      // user 3 never signs up -> not in the funnel at all
      (3L, "click", ts("2024-01-01 00:00:00")),
      (3L, "purchase", ts("2024-01-01 01:00:00")))
      .toDF("user_id", "event_type", "ts")
    val out = Funnel.strict(events, "user_id", "event_type", "ts",
        Seq("signup", "click", "purchase"))
      .collect().map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_entities"))
      .toMap
    assert(out("signup") == 2L)
    assert(out("signup>click") == 2L)
    assert(out("signup>click>purchase") == 1L)
  }

  test("an unreachable stage still reports a zero row") {
    val events = Seq((1L, "signup", ts("2024-01-01 00:00:00")))
      .toDF("user_id", "event_type", "ts")
    val out = Funnel.strict(events, "user_id", "event_type", "ts",
        Seq("signup", "click"))
      .collect().map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_entities"))
      .toMap
    assert(out == Map("signup" -> 1L, "signup>click" -> 0L))
  }

  test("equal timestamps do not satisfy the strictly-after rule") {
    val events = Seq(
      (1L, "signup", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 00:00:00")))
      .toDF("user_id", "event_type", "ts")
    val out = Funnel.strict(events, "user_id", "event_type", "ts",
        Seq("signup", "click"))
      .collect().map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_entities"))
      .toMap
    assert(out("signup>click") == 0L)
  }
}
