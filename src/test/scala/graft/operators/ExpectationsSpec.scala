package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class ExpectationsSpec extends SparkSuite {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[String]("expectation") ->
      ((r.getAs[Long]("n_checked"), r.getAs[Long]("n_failed"),
        r.getAs[Long]("pass")))).toMap

  test("row checks: NULL predicate counts as violation, counters per check") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 10.0), (2L, -5.0), (3L, null), (null, 20.0))
      .toDF("id", "v")
    val out = rows(Expectations.audit(df, Seq(
      "id_not_null" -> col("id").isNotNull,
      "v_positive" -> (col("v") > 0))))
    assert(out("id_not_null") == ((4L, 1L, 0L)))
    // -5 violates outright; the NULL v is an unknown -> violation too
    assert(out("v_positive") == ((4L, 2L, 0L)))
  }

  test("referential: missing and NULL foreign keys fail; non-unique dim keys don't fan out") {
    val facts = Seq[(Long, java.lang.Long)](
      (1L, 10L), (2L, 10L), (3L, 99L), (4L, null)).toDF("id", "fk")
    // dim key 10 appears twice: the distinct() guard must keep
    // n_checked at 4, not fan the join out to 6
    val dim = Seq(10L, 10L, 20L).toDF("k")
    val out = rows(Expectations.audit(facts,
      Seq("id_not_null" -> col("id").isNotNull),
      Seq(("fk_ref", "fk", dim, "k"))))
    assert(out("fk_ref") == ((4L, 2L, 0L)))
  }

  test("all-green suite reports pass = 1 and fail_rate 0.0") {
    val df = Seq((1L, 5.0), (2L, 6.0)).toDF("id", "v")
    val out = Expectations.audit(df, Seq("v_pos" -> (col("v") > 0)))
      .collect().head
    assert(out.getAs[Long]("pass") == 1L)
    assert(out.getAs[Double]("fail_rate") == 0.0)
  }

  test("empty table: vacuous truth reports pass = NULL, never 1 (gate cannot promote an empty snapshot)") {
    val df = Seq.empty[(Long, Double)].toDF("id", "v")
    val out = Expectations.audit(df, Seq("v_pos" -> (col("v") > 0)))
      .collect().head
    assert(out.getAs[Long]("n_checked") == 0L)
    assert(out.getAs[Long]("n_failed") == 0L)
    assert(out.isNullAt(out.fieldIndex("fail_rate")))
    assert(out.isNullAt(out.fieldIndex("pass")))
  }

  test("duplicate names and empty suites are rejected") {
    val df = Seq((1L, 5.0)).toDF("id", "v")
    intercept[IllegalArgumentException](
      Expectations.audit(df, Seq("a" -> (col("v") > 0), "a" -> col("id").isNotNull)))
    intercept[IllegalArgumentException](Expectations.audit(df, Nil))
  }

  test("output is one row per expectation, ordered by name") {
    val df = Seq((1L, 5.0)).toDF("id", "v")
    val names = Expectations.audit(df, Seq(
        "z_check" -> (col("v") > 0),
        "a_check" -> col("id").isNotNull,
        "m_check" -> (col("v") < 100)))
      .collect().map(_.getAs[String]("expectation")).toSeq
    assert(names == Seq("a_check", "m_check", "z_check"))
  }
}
