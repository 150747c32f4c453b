package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite

class CdcSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("applyChangelog: updates, deletes, inserts, latest version wins") {
    val snap = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("id", "name", "score")
    val cl = Seq(
      (1L, "a2", 11, 1L, "upsert"),   // update
      (1L, "a3", 12, 3L, "upsert"),   // later update wins
      (2L, "b", 20, 1L, "delete"),    // delete
      (4L, "d", 40, 1L, "upsert"),    // insert
      (5L, "e", 50, 1L, "upsert"),
      (5L, "e", 50, 2L, "delete")     // insert then delete: gone
    ).toDF("id", "name", "score", "version", "op")
    val got = Cdc.applyChangelog(snap, cl, "id", "version", "op")
      .orderBy("id")
      .as[(Long, Long, String, Int)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, "a3", 12),
      (3L, 0L, "c", 30),
      (4L, 1L, "d", 40)))
  }

  test("applyChangelog: a duplicate version for a key raises, never guesses") {
    val snap = Seq((1L, "a")).toDF("id", "name")
    val cl = Seq((1L, "x", 1L, "upsert"), (1L, "y", 1L, "upsert"))
      .toDF("id", "name", "version", "op")
    val e = intercept[Exception] {
      Cdc.applyChangelog(snap, cl, "id", "version", "op").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("duplicate version")))
  }

  test("applyChangelog: a version tie whose winner is a delete still raises") {
    // the guard rides in the keep-this-key predicate itself, so the
    // raise cannot be short-circuited away by the delete filter — a
    // silent drop here would hide the no-defined-winner corruption
    val snap = Seq((1L, "a")).toDF("id", "name")
    val cl = Seq((1L, "x", 1L, "delete"), (1L, "y", 1L, "delete"))
      .toDF("id", "name", "version", "op")
    val e = intercept[Exception] {
      Cdc.applyChangelog(snap, cl, "id", "version", "op").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("duplicate version")))
  }

  test("applyChangelog: mismatched payload schemas are rejected") {
    val snap = Seq((1L, "a")).toDF("id", "name")
    val cl = Seq((1L, 9, 1L, "upsert")).toDF("id", "other", "version", "op")
    intercept[IllegalArgumentException] {
      Cdc.applyChangelog(snap, cl, "id", "version", "op")
    }
  }

  test("scd2: collapses no-op repeats, closes intervals, flags current") {
    val rows = Seq(
      ("u1", ts("2024-01-01 00:00:00"), 1L, "free"),
      ("u1", ts("2024-01-02 00:00:00"), 2L, "free"),   // no-op: collapsed
      ("u1", ts("2024-01-03 00:00:00"), 3L, "pro"),
      ("u1", ts("2024-01-04 00:00:00"), 4L, "free"),   // back: new interval
      ("u2", ts("2024-01-01 12:00:00"), 5L, "pro"))
      .toDF("user", "ts", "seq", "plan")
    val got = Cdc.scd2(rows.toDF(), "user", "ts", "seq", Seq("plan"))
      .orderBy("user", "valid_from")
      .as[(String, String, Timestamp, Option[Timestamp], Int)]
      .collect().toSeq
    assert(got == Seq(
      ("u1", "free", ts("2024-01-01 00:00:00"),
        Some(ts("2024-01-03 00:00:00")), 0),
      ("u1", "pro", ts("2024-01-03 00:00:00"),
        Some(ts("2024-01-04 00:00:00")), 0),
      ("u1", "free", ts("2024-01-04 00:00:00"), None, 1),
      ("u2", "pro", ts("2024-01-01 12:00:00"), None, 1)))
  }

  test("scd2: NULL tracked value is a real state, not a wildcard") {
    val rows = Seq(
      ("u1", ts("2024-01-01 00:00:00"), 1L, "a"),
      ("u1", ts("2024-01-02 00:00:00"), 2L, null.asInstanceOf[String]),
      ("u1", ts("2024-01-03 00:00:00"), 3L, null.asInstanceOf[String]),
      ("u1", ts("2024-01-04 00:00:00"), 4L, "a"))
      .toDF("user", "ts", "seq", "plan")
    val got = Cdc.scd2(rows.toDF(), "user", "ts", "seq", Seq("plan"))
      .orderBy("valid_from")
      .as[(String, Option[String], Timestamp, Option[Timestamp], Int)]
      .collect().toSeq
    // a -> NULL -> a: three intervals; the repeated NULL collapses
    assert(got.map(_._2) == Seq(Some("a"), None, Some("a")))
    assert(got.map(_._5) == Seq(0, 0, 1))
  }
}
