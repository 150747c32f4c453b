package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.operators.Lpm

class StreamingLpm6Spec extends SparkSuite {
  import spark.implicits._

  private val blocks = Seq(
    ("2001:db8::/32", "backbone"),
    ("2001:db8:1::/48", "region"),
    ("2001:db8:1:0:2::/80", "site"),
    ("2001:db8:1:0:2:3::/96", "rack"),
    ("fd00::/24", "lab")).toDF("cidr", "owner")

  private val hosts = Seq(
    "2001:db8:1:0:2:3::9",  // 4-level nesting -> rack (lo-long path)
    "2001:db8:1:0:2:99::1", // -> site
    "2001:db8:1:ffff::1",   // -> region
    "2001:db8:77::1",       // -> backbone
    "fd00::1",              // len < anchor (exploded children)
    "2001:dead::1",         // unmatched -> NULLs
    "not-an-ip",            // unparseable -> NULLs
    "2001:db8:1:0:2:3::9")  // duplicate: same enrichment, no state

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.select($"host", $"matched_cidr", $"matched_len", $"owner")
      .as[(String, Option[String], Option[Int], Option[String])]
      .collect().toSeq.sorted

  test("streamed v6 enrichment equals the batch operator row for row") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[String]
    val query = StreamingLpm6.enrich(in.toDF().toDF("host"),
        "host", blocks, "cidr")
      .writeStream.format("memory").queryName("lpm6_parity")
      .outputMode("append").start()
    try {
      // two micro-batches: parity must not depend on batch boundaries
      in.addData(hosts.take(4): _*); query.processAllAvailable()
      in.addData(hosts.drop(4): _*); query.processAllAvailable()
      val streamed = rowsOf(spark.table("lpm6_parity"))
      val batch = rowsOf(Lpm.lpmEnrich6(hosts.toDF("host"), "host",
        blocks, "cidr"))
      assert(streamed == batch)
      assert(streamed.count(_._2.isEmpty) == 2, "unmatched + unparseable")
      assert(streamed.count(_._1 == "2001:db8:1:0:2:3::9") == 2)
    } finally query.stop()
  }

  test("zero streaming state: plan has no stateful operator") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[String]
    val query = StreamingLpm6.enrich(in.toDF().toDF("host"),
        "host", blocks, "cidr")
      .writeStream.format("memory").queryName("lpm6_stateless")
      .outputMode("append").start()
    try {
      in.addData(hosts: _*)
      query.processAllAvailable()
      assert(query.lastProgress.stateOperators.isEmpty)
    } finally query.stop()
  }
}
