package graft

import org.apache.spark.sql.functions._

import graft.functions.IpFunctions.Cidr
import graft.operators.Baseline
import graft.operators.Baseline.BaselineConfig
import graft.queries.Shared

/** The engine is reachable from plain SQL end to end: temp views +
  * the graft_* functions registered by GraftExtensions reproduce the
  * operator API's baseline output exactly.
  */
class SqlSurfaceSpec extends SparkSuite {

  test("baseline aggregation in pure SQL matches the operator API") {
    val dir = "/root/testdata/sf0.001"
    graft.sources.Tables.registerAll(spark, dir)
    val networks = Shared.netList.map(Cidr.parse)
    spark.createDataFrame(
        networks.map(c => (c.start, c.end, c.networkString)))
      .toDF("net_start", "net_end", "network")
      .createOrReplaceTempView("networks")

    val sql = spark.sql(
      """WITH hosts AS (
        |  SELECT *,
        |    concat_ws('.', '10',
        |      shiftright(user_id, 16) & 255,
        |      shiftright(user_id, 8) & 255,
        |      user_id & 255) AS host
        |  FROM events),
        |w AS (
        |  SELECT *, graft_ip4_to_num(host) AS ip_num FROM hosts
        |  WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 7 DAYS),
        |j AS (
        |  SELECT /*+ BROADCAST(networks) */ w.*, n.network
        |  FROM w JOIN networks n
        |    ON w.ip_num BETWEEN n.net_start AND n.net_end)
        |SELECT network, count(*) AS n_rows,
        |  CAST(floor(avg(value)) AS BIGINT) AS packets
        |FROM j GROUP BY network ORDER BY network""".stripMargin)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    val cfg = BaselineConfig(
      hostCol = "host", tsCol = "ts", aggregationFunction = "avg",
      metrics = Map("packets" -> col("value")))
    val api = Baseline.hostgroups(Shared.hostEvents(spark, dir), cfg, networks)
      .collect()
      .map(r => r.getAs[String]("network") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("packets")))).toMap

    assert(sql == api && sql.nonEmpty)
  }

  test("graft_moments is callable from SQL and matches the Column API") {
    val dir = "/root/testdata/sf0.001"
    graft.sources.Tables.registerAll(spark, dir)
    val sql = spark.sql(
      """SELECT label, graft_moments(cast(embedding AS array<double>), 64) AS m
        |FROM embeddings GROUP BY label""".stripMargin)
      .selectExpr("label", "m.n", "m.sx", "m.sxy")
      .collect().map(r => r.get(0) -> r.toSeq.tail).toMap
    val api = graft.sources.Tables.load(spark, dir, "embeddings")
      .groupBy(col("label"))
      .agg(graft.functions.Moments.matrix(
        col("embedding").cast("array<double>"), 64).as("m"))
      .selectExpr("label", "m.n", "m.sx", "m.sxy")
      .collect().map(r => r.get(0) -> r.toSeq.tail).toMap
    assert(sql.nonEmpty && sql == api)
  }

  test("graft_zorder2 is callable from SQL and matches the kernel") {
    val got = spark.sql("SELECT graft_zorder2(3L, 3L) AS z, graft_zorder2(1L, 0L) AS a")
      .collect().head
    assert(got.getAs[Long]("z") == 15L)
    assert(got.getAs[Long]("a") == 1L)
  }

  test("wrong arity raises the analyzer error, not IndexOutOfBounds") {
    val e1 = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT graft_zorder2(1L)").collect())
    assert(e1.getMessage.contains("graft_zorder2"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT graft_dot(array(1.0D))").collect())
    assert(e2.getMessage.contains("graft_dot"))
    val e3 = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT graft_ip4_to_num()").collect())
    assert(e3.getMessage.contains("graft_ip4_to_num"))
  }
}
