package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Expectations

final case class OrderRow(o_id: Long, price: java.lang.Double,
    status: String, cust: java.lang.Long)

class StreamingExpectationsSpec extends SparkSuite {
  import spark.implicits._

  private val checks = Seq(
    "id_not_null" -> col("o_id").isNotNull,
    "price_positive" -> (col("price") > 0.0),
    "status_in_domain" -> col("status").isInCollection(Seq("O", "F")))

  private def dim = Seq(10L, 20L, 30L).toDF("c_id")

  private def refChecks = Seq(("cust_referential", "cust", dim, "c_id"))

  private val rows: Seq[OrderRow] = Seq(
    OrderRow(1L, 5.0, "O", 10L),              // clean
    OrderRow(2L, -1.0, "F", 20L),             // price fails
    OrderRow(3L, null, "X", 99L),             // price NULL + status + ref
    OrderRow(4L, 2.0, "O", null),             // NULL fk fails referential
    OrderRow(5L, 3.0, "F", 30L),              // clean
    OrderRow(6L, 7.0, "O", 40L))              // ref fails

  private def names =
    StreamingExpectations.expectationNames(checks, refChecks)

  /** Replay `batches`, return the compacted (exp_no, c) snapshot. */
  private def streamed(batches: Seq[Seq[OrderRow]], name: String) = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[OrderRow]
    val query = StreamingExpectations
      .counts(StreamingExpectations.violationStream(
        in.toDF(), checks, refChecks))
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      batches.foreach { b => in.addData(b: _*); query.processAllAvailable() }
      spark.table(name)
        .withColumn("seq", monotonically_increasing_id())
        .groupBy("exp_no")
        .agg(max_by(col("c"), col("seq")).as("c"))
        .localCheckpoint(eager = true)
    } finally query.stop()
  }

  private def report(df: org.apache.spark.sql.DataFrame) = df
    .as[(String, Long, Long, Option[Double], Option[Long])].collect().toSeq

  test("replayed audit equals batch under any micro-batch split") {
    val snap = streamed(Seq(rows.take(2), rows.slice(2, 4), rows.drop(4)),
      "expect_all")
    val batch = Expectations.audit(rows.toDF(), checks, refChecks)
    assert(report(StreamingExpectations.table(snap, names)) == report(batch))
  }

  test("single-batch replay matches too (no split sensitivity)") {
    val snap = streamed(Seq(rows), "expect_one")
    val batch = Expectations.audit(rows.toDF(), checks, refChecks)
    assert(report(StreamingExpectations.table(snap, names)) == report(batch))
  }

  test("violation semantics: NULL predicate and NULL fk both fail") {
    val snap = streamed(Seq(rows), "expect_sem")
    val m = report(StreamingExpectations.table(snap, names))
      .map(r => r._1 -> r._3).toMap
    assert(m("price_positive") == 2L)   // row 2 (negative) + row 3 (NULL)
    assert(m("status_in_domain") == 1L) // row 3
    assert(m("cust_referential") == 3L) // rows 3 (99), 4 (NULL), 6 (40)
    assert(m("id_not_null") == 0L)
  }

  test("empty stream reports the vacuous-pass-is-NULL convention") {
    val snap = streamed(Seq(Seq.empty), "expect_empty")
    val r = report(StreamingExpectations.table(snap, names))
    assert(r.map(_._1) == names.sorted)
    assert(r.forall(x => x._2 == 0L && x._3 == 0L &&
      x._4.isEmpty && x._5.isEmpty))
  }
}
