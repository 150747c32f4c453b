package graft.operators

import java.sql.Timestamp

import graft.SparkSuite

/** Hand-computed checks for the session-analytics operators built on
  * the A6 gap kernel (the gates check them against DuckDB at corpus
  * scale; these pin small, eyeball-verifiable cases).
  */
class FunnelPathSpec extends SparkSuite {
  import spark.implicits._

  private def ev(uid: Long, sec: Long, ty: String, id: Long) =
    (uid, new Timestamp(sec * 1000L), ty, id)

  // user 1, one session: a b a b  -> trigrams a>b>a, b>a>b
  // user 1, second session (gap > 100s): a b c -> a>b>c
  // user 2, one session: a b c -> a>b>c
  private val rows = Seq(
    ev(1L, 0, "a", 1), ev(1L, 10, "b", 2), ev(1L, 20, "a", 3),
    ev(1L, 30, "b", 4),
    ev(1L, 500, "a", 5), ev(1L, 510, "b", 6), ev(1L, 520, "c", 7),
    ev(2L, 0, "a", 8), ev(2L, 50, "b", 9), ev(2L, 99, "c", 10))
    .toDF("user_id", "ts", "event_type", "event_id")

  test("pathTrigrams: hand-computed paths, occurrences, and session counts") {
    val out = Funnel.pathTrigrams(rows, "user_id", "ts", "event_type",
        "event_id", gapSeconds = 100L)
      .orderBy("path")
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("a>b>a", 1L, 1L),
      ("a>b>c", 2L, 2L),
      ("b>a>b", 1L, 1L)))
  }

  test("basketPairs: hand-computed support and lift") {
    // sessions and their type sets: {a,b}, {a,b,c}, {a,b,c} -> N = 3
    // n_a = 3, n_b = 3, n_c = 2; n_ab = 3, n_ac = 2, n_bc = 2
    // lift(a,b) = 3*3/(3*3) = 1.0; lift(a,c) = 3*2/(3*2) = 1.0
    val out = Funnel.basketPairs(rows, "user_id", "ts", "event_type",
        "event_id", gapSeconds = 100L)
      .orderBy("type_a", "type_b")
      .select("type_a", "type_b", "n_ab", "n_a", "n_b", "n_sessions", "lift")
      .as[(String, String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("a", "b", 3L, 3L, 3L, 3L, 1.0),
      ("a", "c", 2L, 3L, 2L, 3L, 1.0),
      ("b", "c", 2L, 3L, 2L, 3L, 1.0)))
  }

  test("basketPairs: a type pair NEVER co-occurring is absent, lift < 1 possible") {
    // s1 {a,b}, s2 {a}, s3 {b}: n_ab = 1, n_a = 2, n_b = 2, N = 3
    // lift = 3*1/4 = 0.75
    val r = Seq(
      ev(1L, 0, "a", 1), ev(1L, 10, "b", 2),
      ev(2L, 0, "a", 3), ev(3L, 0, "b", 4))
      .toDF("user_id", "ts", "event_type", "event_id")
    val out = Funnel.basketPairs(r, "user_id", "ts", "event_type",
        "event_id", 100L)
      .select("type_a", "type_b", "n_ab", "lift")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out == Seq(("a", "b", 1L, 0.75)))
  }
}
