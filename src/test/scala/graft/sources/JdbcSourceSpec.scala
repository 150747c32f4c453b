package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The reference's ACTUAL input is a database over the wire — a
  * ClickHouse TCP connection (main.go:97-104, `sql.Open("clickhouse",
  * ...)` reading `fastnetmon.host_metrics`). graft's claim (SURVEY §3)
  * is that any `spark.read.jdbc` source slots in because everything
  * downstream is DataFrame-shaped; this spec EXERCISES that claim
  * against an embedded Derby database (the JDBC engine shipped in
  * Spark's own jars — no egress needed) instead of asserting it:
  *
  *   1. filters and column pruning reach the JDBC scan (PushedFilters
  *      + pruned scan output — the WHERE runs in the DATABASE, which
  *      at the reference's scale is the difference between shipping a
  *      window and shipping the table);
  *   2. the partitioned read contract (partitionColumn/bounds/
  *      numPartitions) splits the table into parallel per-range
  *      queries — the 1000-executor ingest shape;
  *   3. the reference's own baseline computation runs unchanged on
  *      the JDBC frame (same operator, different source — the
  *      source-agnosticism contract, not a JDBC-specific code path).
  */
class JdbcSourceSpec extends SparkSuite {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  private lazy val seeded: Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute(
        "CREATE TABLE host_metrics (host VARCHAR(32), ts BIGINT, val BIGINT)")
      val ps = conn.prepareStatement("INSERT INTO host_metrics VALUES (?, ?, ?)")
      for (i <- 0 until 1000) {
        ps.setString(1, s"10.0.0.${i % 64}")
        ps.setLong(2, i.toLong)
        ps.setLong(3, (i * 7 % 100).toLong)
        ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()
  }

  private def jdbcTable(extra: (String, String)*) = {
    seeded
    extra.foldLeft(spark.read.format("jdbc")
        .option("url", url).option("driver", driver)
        .option("dbtable", "host_metrics")) {
      case (r, (k, v)) => r.option(k, v)
    }.load()
  }

  test("filter and projection push down into the JDBC scan") {
    val df = jdbcTable().filter(col("val") > 50).select("host", "val")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters:") && scan.contains("GreaterThan"),
      s"filter did not reach the JDBC scan:\n$scan")
    // column pruning: ts is neither projected nor filtered on, so the
    // scan's output must not carry it (the SELECT list sent to the
    // database is the pruned one)
    val scanLine = scan.linesIterator
      .find(_.contains("JDBCRelation")).getOrElse(scan)
    assert(!scanLine.toUpperCase.contains("TS#"),
      s"unused column not pruned from the JDBC scan: $scanLine")
    assert(df.count() === 1000L * 49 / 100) // val in 51..99: 49 of 100 residues
  }

  test("partitioned read splits the table into parallel range queries") {
    val df = jdbcTable("partitionColumn" -> "ts", "lowerBound" -> "0",
      "upperBound" -> "1000", "numPartitions" -> "4")
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 1000L)
    // ranges must partition, not sample: every row exactly once
    assert(df.agg(countDistinct(col("ts"))).head.getLong(0) === 1000L)
  }

  test("the reference baseline computation runs unchanged on a JDBC source") {
    val jdbc = jdbcTable().withColumnRenamed("val", "value")
    val viaJdbc = jdbc.groupBy("host")
      .agg(avg("value").as("avg_value"), max("value").as("max_value"),
        count(lit(1)).as("n"))
    val viaMemory = {
      import spark.implicits._
      (0 until 1000).map(i => (s"10.0.0.${i % 64}", i.toLong, (i * 7 % 100).toLong))
        .toDF("host", "ts", "value")
        .groupBy("host")
        .agg(avg("value").as("avg_value"), max("value").as("max_value"),
          count(lit(1)).as("n"))
    }
    assert(viaJdbc.except(viaMemory).isEmpty && viaMemory.except(viaJdbc).isEmpty)
  }
}
