package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Baseline.{BaselineConfig, ThresholdRule}

/** The reference's cron loop (baseline → hostgroups → remove/create
  * API actions) as one continuous query: each watermark-finalized
  * window triggers a reconciliation against the current hostgroups.
  */
class StreamingHostgroupsSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("finalized windows drive remove/create hostgroup actions") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext

    val mem = MemoryStream[Ev]
    val cfg = BaselineConfig(
      hostCol = "host", tsCol = "ts", aggregationFunction = "avg",
      metrics = Map("packets_incoming" -> col("value")),
      rules = Seq(ThresholdRule("packets_incoming", "value * 2", "threshold_pps")))

    val applied = mutable.Buffer.empty[(Long, Seq[(Int, String, String)])]
    val query = StreamingHostgroups.run(
      mem.toDF(), cfg, prefix = 24,
      windowDuration = "10 minutes", slideDuration = "10 minutes",
      watermarkDelay = "0 seconds",
      removeExisting = true,
      currentHostgroups = s => {
        import s.implicits._
        Seq("global", "stale_group").toDF("name")
      },
      applyActions = (id, rows) => applied.synchronized {
        applied += id -> rows.map((r: Row) => (r.getAs[Int]("step"),
          r.getAs[String]("action"), r.getAs[String]("name")))
      })
    try {
      mem.addData(
        Ev("10.0.0.1", ts("2024-01-01 00:01:00"), 100.0),
        Ev("10.0.1.9", ts("2024-01-01 00:03:00"), 50.0))
      query.processAllAvailable()
      // advance the watermark past window 1 to finalize it
      mem.addData(Ev("10.0.0.7", ts("2024-01-01 00:25:00"), 75.0))
      query.processAllAvailable()

      val plans = applied.synchronized(applied.toList)
      assert(plans.nonEmpty, "no reconciliation fired")
      val actions = plans.head._2
      // sweep removes everything but global, then creates the groups
      // generated from the finalized window
      assert(actions == Seq(
        (0, "remove", "stale_group"),
        (1, "create", "10_0_0_0"),
        (1, "create", "10_0_1_0")))
    } finally query.stop()
  }
}
