package graft.operators

import org.apache.spark.sql.Column

import graft.operators.Baseline.{BaselineConfig, ThresholdRule}

/** The reference's JSON configuration surface
  * (/root/reference/main.go:20-50, /etc/baseline_magician.conf) mapped
  * onto [[BaselineConfig]] — a baseline_magician user brings their
  * config file unchanged; only the connection fields (ClickHouse /
  * FastNetMon API) are irrelevant here because the input is whatever
  * DataFrame the caller loads.
  */
final case class ReferenceConfig(
    calculationPeriod: Long = 604800L,          // calculaton_period [sic]
    aggregationFunction: String = "avg",        // aggregation_function
    generatePacketThreshold: Boolean = true,    // generate_incoming_packet_threshold
    incomingPacketExpression: String = "value", // incoming_packet_expression
    generateBitThreshold: Boolean = true,
    incomingBitExpression: String = "value",
    generateFlowThreshold: Boolean = true,
    incomingFlowExpression: String = "value") {

  /** Threshold rules exactly as main.go:352-435 wires them, including
    * the bits -> mbps divisor (main.go:398).
    */
  def rules: Seq[ThresholdRule] = {
    val pps =
      if (generatePacketThreshold)
        Seq(ThresholdRule("packets_incoming", incomingPacketExpression, "threshold_pps"))
      else Nil
    val mbps =
      if (generateBitThreshold)
        Seq(ThresholdRule("bits_incoming", incomingBitExpression, "threshold_mbps",
          divisor = 1024L * 1024L))
      else Nil
    val flows =
      if (generateFlowThreshold)
        Seq(ThresholdRule("flows_incoming", incomingFlowExpression, "threshold_flows"))
      else Nil
    pps ++ mbps ++ flows
  }

  def toBaselineConfig(hostCol: String, tsCol: String,
      metrics: Map[String, Column]): BaselineConfig =
    BaselineConfig(
      hostCol = hostCol, tsCol = tsCol,
      windowSeconds = calculationPeriod,
      aggregationFunction = aggregationFunction,
      metrics = metrics,
      rules = rules)
}

object ReferenceConfig {

  /** Parse the reference's config-file JSON (jackson is already on the
    * Spark classpath; unknown fields — connection settings etc. — are
    * ignored).
    */
  def fromJson(json: String): ReferenceConfig = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    def str(field: String, dflt: String): String =
      if (node.hasNonNull(field)) node.get(field).asText(dflt) else dflt
    def bool(field: String, dflt: Boolean): Boolean =
      if (node.hasNonNull(field)) node.get(field).asBoolean(dflt) else dflt
    def long(field: String, dflt: Long): Long =
      if (node.hasNonNull(field)) node.get(field).asLong(dflt) else dflt
    ReferenceConfig(
      calculationPeriod = long("calculaton_period", 604800L),
      aggregationFunction = str("aggregation_function", "avg"),
      generatePacketThreshold = bool("generate_incoming_packet_threshold", true),
      incomingPacketExpression = str("incoming_packet_expression", "value"),
      generateBitThreshold = bool("generate_incoming_bit_threshold", true),
      incomingBitExpression = str("incoming_bit_expression", "value"),
      generateFlowThreshold = bool("generate_incoming_flow_threshold", true),
      incomingFlowExpression = str("incoming_flow_expression", "value"))
  }
}
