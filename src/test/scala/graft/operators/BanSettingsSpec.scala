package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.IpFunctions.Cidr
import graft.operators.Baseline.{BaselineConfig, ThresholdRule}

class BanSettingsSpec extends SparkSuite {
  import spark.implicits._

  test("hostgroups render as FastNetMon ban-settings payloads") {
    val df = Seq(
      ("10.0.0.1", Timestamp.valueOf("2024-01-10 00:00:00"), 100.0),
      ("10.0.0.2", Timestamp.valueOf("2024-01-09 00:00:00"), 200.0))
      .toDF("host", "ts", "value")
    val cfg = BaselineConfig(
      hostCol = "host", tsCol = "ts",
      aggregationFunction = "avg",
      metrics = Map(
        "packets_incoming" -> col("value"),
        "bits_incoming" -> (col("value") * 1048576L),
        "flows_incoming" -> col("value")),
      rules = Seq(
        ThresholdRule("packets_incoming", "value * 2", "threshold_pps"),
        ThresholdRule("bits_incoming", "value * 3", "threshold_mbps", divisor = 1048576L),
        // deactivating rule -> flag false, value omitted from payload
        ThresholdRule("flows_incoming", "value - 10000", "threshold_flows")))
    val hg = Baseline.hostgroups(df, cfg, Seq(Cidr.parse("10.0.0.0/24")))
    val out = BanSettings.fromHostgroups(hg).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("name") == "10_0_0_0_24")
    assert(r.getAs[scala.collection.Seq[String]]("networks") == Seq("10.0.0.0/24"))
    assert(r.getAs[Boolean]("enable_ban"))
    assert(r.getAs[Boolean]("ban_for_pps"))
    assert(r.getAs[Boolean]("ban_for_bandwidth"))
    assert(!r.getAs[Boolean]("ban_for_flows"))
    assert(r.getAs[Long]("threshold_pps") == 300L)
    assert(r.getAs[Long]("threshold_mbps") == 450L)
    val json = r.getAs[String]("payload")
    assert(json.contains(""""name":"10_0_0_0_24""""))
    assert(json.contains(""""networks":["10.0.0.0/24"]"""))
    assert(json.contains(""""ban_for_pps":true"""))
    assert(json.contains(""""ban_for_flows":false"""))
    // deactivated threshold value is absent (to_json drops nulls),
    // matching the reference's omitted zero-value field
    assert(!json.contains("threshold_flows"))
  }

  private def plan(removeExisting: Boolean) = {
    val generated = Seq(("10_0_0_0_24", "p1"), ("10_0_1_0_24", "p2"))
      .toDF("name", "payload")
    val current = Seq("global", "10_0_0_0_24", "stale_group").toDF("name")
    BanSettings.lifecyclePlan(generated, current, removeExisting)
      .collect()
      .map(r => (r.getAs[Int]("step"), r.getAs[String]("action"),
        r.getAs[String]("name"), Option(r.getAs[String]("payload"))))
      .sortBy(t => (t._1, t._3))
  }

  test("lifecycle plan, remove_existing=true: sweep all but global, then create") {
    assert(plan(removeExisting = true).toSeq == Seq(
      (0, "remove", "10_0_0_0_24", None),
      (0, "remove", "stale_group", None),
      (1, "create", "10_0_0_0_24", Some("p1")),
      (1, "create", "10_0_1_0_24", Some("p2"))))
  }

  test("lifecycle plan, remove_existing=false: overwrite-by-name only") {
    // stale_group survives; only the name collision is removed first
    assert(plan(removeExisting = false).toSeq == Seq(
      (0, "remove", "10_0_0_0_24", None),
      (1, "create", "10_0_0_0_24", Some("p1")),
      (1, "create", "10_0_1_0_24", Some("p2"))))
  }
}
