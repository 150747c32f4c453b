package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.operators.Lpm

class StreamingLpmSpec extends SparkSuite {
  import spark.implicits._

  private val blocks = Seq(
    ("10.0.0.0/8", "backbone"),
    ("10.1.0.0/16", "region"),
    ("10.1.2.0/24", "site"),
    ("10.1.2.128/25", "rack"),
    ("192.168.0.0/16", "lab")).toDF("cidr", "owner")

  private val hosts = Seq(
    "10.1.2.200",  // 4-level nesting -> rack
    "10.1.2.5",    // -> site
    "10.1.9.1",    // -> region
    "10.7.0.1",    // -> backbone
    "192.168.3.4", // len == anchor
    "172.16.0.1",  // unmatched -> NULLs
    "10.1.2.200")  // duplicate: same enrichment, no dedup state

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.select($"host", $"matched_cidr", $"matched_len", $"owner")
      .as[(String, Option[String], Option[Int], Option[String])]
      .collect().toSeq.sorted

  test("streamed enrichment equals the batch operator row for row") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[String]
    val query = StreamingLpm.enrich(in.toDF().toDF("host"),
        "host", blocks, "cidr")
      .writeStream.format("memory").queryName("lpm_parity")
      .outputMode("append").start()
    try {
      // two micro-batches: parity must not depend on batch boundaries
      in.addData(hosts.take(3): _*); query.processAllAvailable()
      in.addData(hosts.drop(3): _*); query.processAllAvailable()
      val streamed = rowsOf(spark.table("lpm_parity"))
      val batch = rowsOf(Lpm.lpmEnrich(hosts.toDF("host"), "host",
        blocks, "cidr"))
      assert(streamed == batch)
      assert(streamed.exists(_._2.isEmpty), "unmatched host kept NULLs")
      assert(streamed.count(_._1 == "10.1.2.200") == 2)
    } finally query.stop()
  }

  test("zero streaming state: plan has no stateful operator") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[String]
    val query = StreamingLpm.enrich(in.toDF().toDF("host"),
        "host", blocks, "cidr")
      .writeStream.format("memory").queryName("lpm_stateless")
      .outputMode("append").start()
    try {
      in.addData(hosts: _*)
      query.processAllAvailable()
      val progress = query.lastProgress
      assert(progress.stateOperators.isEmpty ||
        progress.stateOperators.forall(_.numRowsTotal == 0))
    } finally query.stop()
  }

  test("anchor choice never changes the streamed result") {
    implicit val ctx = spark.sqlContext
    def run(anchor: Int) = {
      val in = MemoryStream[String]
      val query = StreamingLpm.enrich(in.toDF().toDF("host"),
          "host", blocks, "cidr", anchor = anchor)
        .writeStream.format("memory").queryName(s"lpm_a$anchor")
        .outputMode("append").start()
      try {
        in.addData(hosts: _*)
        query.processAllAvailable()
        rowsOf(spark.table(s"lpm_a$anchor"))
      } finally query.stop()
    }
    val base = run(16)
    assert(run(8) == base && run(24) == base)
  }
}
