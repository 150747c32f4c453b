package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType, TimestampType}

import graft.functions.IpFunctions.Cidr
import graft.operators.{BanSettings, Baseline, ReferenceConfig}
import graft.operators.Baseline.BaselineConfig

/** The full reference user journey, end to end: the README's own
  * config file (/root/reference/README.md), a host_metrics-shaped
  * table, networks list in, FastNetMon ban-settings payloads out —
  * everything a baseline_magician user runs today, in one declarative
  * Spark plan.
  */
class ReferenceJourneySpec extends SparkSuite {
  import spark.implicits._

  // the README's config verbatim (connection fields ignored by design)
  private val confJson = """{
    "clickhouse_host": "127.0.0.1",
    "clickhouse_port": 9000,
    "clickhouse_user": "admin",
    "clickhouse_password": "secure",
    "calculaton_period": 604800,
    "clickhouse_database": "fastnetmon",
    "clickhouse_table": "host_metrics",
    "api_user": "admin",
    "api_password": "XXX",
    "api_host": "127.0.0.1",
    "api_port": 10007,
    "generate_incoming_packet_threshold": true,
    "incoming_packet_expression": "value * 2",
    "generate_incoming_bit_threshold": true,
    "incoming_bit_expression": "value * 3",
    "generate_incoming_flow_threshold": true,
    "incoming_flow_expression": "value + 200"
  }"""

  private def ts(s: String) = Timestamp.valueOf(s)

  test("config file -> host_metrics -> hostgroups -> ban-settings payloads") {
    // host_metrics-shaped input (reference's ClickHouse table)
    val hostMetrics = Seq(
      ("192.168.1.10", ts("2024-01-10 00:00:00"), 1000.0, 8388608.0, 50.0),
      ("192.168.1.20", ts("2024-01-09 00:00:00"), 3000.0, 25165824.0, 150.0),
      // outside the 7-day calculaton_period -> excluded
      ("192.168.1.30", ts("2023-12-01 00:00:00"), 999999.0, 1.0e12, 9999.0),
      // network not in the list -> no hostgroup ("global host group")
      ("203.0.113.5", ts("2024-01-10 00:00:00"), 77.0, 1234.0, 7.0))
      .toDF("host", "metricDateTime", "packets_incoming", "bits_incoming",
        "flows_incoming")

    val rc = ReferenceConfig.fromJson(confJson)
    assert(rc.calculationPeriod == 604800L)

    val cfg = rc.toBaselineConfig(
      hostCol = "host", tsCol = "metricDateTime",
      metrics = Map(
        "packets_incoming" -> col("packets_incoming"),
        "bits_incoming" -> col("bits_incoming"),
        "flows_incoming" -> col("flows_incoming")))

    // "customers write 192.168.1.33/24 meaning 192.168.1.0/24"
    val networks = Seq("192.168.1.33/24", "10.99.0.0/16").map(Cidr.parse)

    val hg = Baseline.hostgroups(hostMetrics, cfg, networks)
    val payloads = BanSettings.fromHostgroups(hg).collect()

    // one group: 192.168.1.0/24 (10.99/16 empty -> skipped; stale and
    // out-of-list rows excluded)
    assert(payloads.length == 1)
    val p = payloads.head
    assert(p.getAs[String]("name") == "192_168_1_0_24")
    assert(p.getAs[scala.collection.Seq[String]]("networks") ==
      Seq("192.168.1.0/24"))
    // avg(1000, 3000) = 2000 -> * 2 = 4000 pps
    assert(p.getAs[Long]("threshold_pps") == 4000L)
    // avg(8 Mib, 24 Mib) = 16 Mib -> * 3 / 2^20 = 48 mbps
    assert(p.getAs[Long]("threshold_mbps") == 48L)
    // avg(50, 150) = 100 -> + 200 = 300 flows
    assert(p.getAs[Long]("threshold_flows") == 300L)
    assert(p.getAs[Boolean]("enable_ban") &&
      p.getAs[Boolean]("ban_for_pps") &&
      p.getAs[Boolean]("ban_for_bandwidth") &&
      p.getAs[Boolean]("ban_for_flows"))
    val json = p.getAs[String]("payload")
    assert(json.contains(""""threshold_mbps":48"""))
  }

  test("full 26-counter width aggregates in one pass (main.go:240-279)") {
    val counters = Seq(
      "packets", "bits", "flows", "tcp_packets", "tcp_bits",
      "udp_packets", "udp_bits", "icmp_packets", "icmp_bits",
      "fragmented_packets", "fragmented_bits", "tcp_syn_packets",
      "tcp_syn_bits").flatMap(c => Seq(s"${c}_incoming", s"${c}_outgoing"))
    assert(counters.length == 26)
    // two in-window rows; counter k has values (k+1) and 3*(k+1)
    val rows = Seq(
      Seq("192.168.1.10", ts("2024-01-10 00:00:00")) ++
        counters.indices.map(k => (k + 1).toDouble),
      Seq("192.168.1.20", ts("2024-01-09 00:00:00")) ++
        counters.indices.map(k => 3.0 * (k + 1)))
    val schema = StructType(
      StructField("host", StringType) ::
        StructField("metricDateTime", TimestampType) ::
        counters.map(c => StructField(c, DoubleType)).toList)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromSeq)), schema)
    val cfg = BaselineConfig(
      hostCol = "host", tsCol = "metricDateTime",
      aggregationFunction = "avg",
      metrics = counters.map(c => c -> col(c)).toMap)
    val out = Baseline.hostgroups(df, cfg,
      Seq(Cidr.parse("192.168.1.0/24"))).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_rows") == 2L)
    // avg of (k+1, 3(k+1)) = 2(k+1)
    counters.zipWithIndex.foreach { case (c, k) =>
      assert(r.getAs[Long](c) == 2L * (k + 1), s"counter $c")
    }
  }
}
