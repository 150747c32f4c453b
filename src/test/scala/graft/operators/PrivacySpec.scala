package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class PrivacySpec extends SparkSuite {
  import spark.implicits._

  // (zip, age_band, diagnosis) — the classic QI/sensitive shape
  private def corpus = Seq(
    ("10001", "30-39", "flu"),
    ("10001", "30-39", "flu"),
    ("10001", "30-39", "covid"),
    ("10001", "40-49", "flu"),      // singleton group
    ("10002", "30-39", "covid"),
    ("10002", "30-39", "covid"),    // 2-row group, homogeneous
    ("10003", "50-59", "asthma"),
    ("10003", "50-59", "flu"),
    ("10003", "50-59", "covid")
  ).toDF("zip", "age_band", "diagnosis")

  test("group sizes, l-diversity, and the at_risk flag are exact") {
    val got = Privacy.kAnonymity(corpus, Seq("zip", "age_band"),
        col("diagnosis"), k = 3)
      .orderBy("zip", "age_band")
      .as[(String, String, Long, Long, Int)].collect().toSeq
    assert(got == Seq(
      ("10001", "30-39", 3L, 2L, 0),
      ("10001", "40-49", 1L, 1L, 1),
      ("10002", "30-39", 2L, 1L, 1),
      ("10003", "50-59", 3L, 3L, 0)))
  }

  test("summary rolls up groups, rows at risk, and the two minima") {
    val got = Privacy.kAnonymitySummary(corpus, Seq("zip", "age_band"),
        col("diagnosis"), k = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // 4 groups; 2 at risk carrying 1 + 2 = 3 rows; min size 1; the
    // homogeneous (10002, 30-39) group pins min l-diversity at 1
    assert(got == Seq((4L, 2L, 3L, 1L, 1L)))
  }

  test("k = 1 marks nothing at risk; null sensitive values don't count") {
    val withNull = corpus.union(
      Seq(("10004", "20-29", null.asInstanceOf[String]))
        .toDF("zip", "age_band", "diagnosis"))
    val rows = Privacy.kAnonymity(withNull, Seq("zip"), col("diagnosis"), 1)
      .orderBy("zip")
      .as[(String, Long, Long, Int)].collect().toSeq
    assert(rows.forall(_._4 == 0))
    // count(DISTINCT) ignores NULL: the 10004 group has 0 diversity
    assert(rows.find(_._1 == "10004").get._3 == 0L)
  }
}
