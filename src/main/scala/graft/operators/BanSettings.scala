package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Materializes [[Baseline.hostgroups]] output as FastNetMon
  * ban-settings payloads — the exact structure the reference posts to
  * the FastNetMon API (fastnetmon-go Ban_settings_t, reference
  * main.go:338-437): name, networks, enable_ban, ban_for_* flags and
  * threshold_* values, with deactivated thresholds omitted.
  *
  * A user of the reference switches by feeding `payload` to their API
  * client; everything upstream (scan -> window -> aggregate ->
  * thresholds) already ran distributed, and the JSON rendering itself
  * is a codegen'd to_json projection, not driver-side work.
  */
object BanSettings {

  /** hostgroups frame -> one ban-settings row per network, plus the
    * JSON payload column.
    */
  def fromHostgroups(hg: DataFrame): DataFrame = {
    val has = hg.columns.toSet
    def thr(name: String) =
      if (has(name)) col(name) else lit(null).cast("long")
    def active(name: String) =
      if (has(s"${name}_active")) coalesce(col(s"${name}_active"), lit(false))
      else lit(false)
    val shaped = hg.select(
      col("hostgroup").as("name"),
      array(col("network")).as("networks"),
      lit(true).as("enable_ban"),
      active("threshold_pps").as("ban_for_pps"),
      active("threshold_mbps").as("ban_for_bandwidth"),
      active("threshold_flows").as("ban_for_flows"),
      thr("threshold_pps").as("threshold_pps"),
      thr("threshold_mbps").as("threshold_mbps"),
      thr("threshold_flows").as("threshold_flows"))
    shaped.withColumn("payload",
      to_json(struct(shaped.columns.map(col).toIndexedSeq: _*)))
  }
}
