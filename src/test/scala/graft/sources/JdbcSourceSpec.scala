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

  test("the reference's CIDR membership predicate pushes into the JDBC scan") {
    // the reference's actual ClickHouse query shape: host_metrics
    // filtered to a networks_list block (main.go:112-133). graft's
    // cidr predicate is a numeric range on a long column, so it must
    // reach the DATABASE as two pushed comparisons — the filter runs
    // where the data lives, exactly as it does against parquet
    // (CidrPushdownSpec proves the parquet leg)
    // host space is 10.0.0.0-10.0.0.63; /28 keeps 16 of the 64 hosts
    val df = jdbcTable().filter(graft.functions.IpFunctions.cidrContains(
      "10.0.0.16/28", graft.functions.IpFunctions.ip4ToNum(col("host"))))
    // ip4ToNum(host) is an expression the database can't evaluate, so
    // for the PUSHED variant store the numeric column (the production
    // layout: parse once at ingest, store the long — SURVEY §4)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE host_metrics_num") catch { case _: Throwable => () }
      st.execute("CREATE TABLE host_metrics_num (host_num BIGINT, val BIGINT)")
      st.execute("INSERT INTO host_metrics_num " +
        "SELECT 167772160 + ts, val FROM host_metrics") // 10.0.0.0 + ts
    } finally conn.close()
    val stored = spark.read.format("jdbc")
      .option("url", url).option("driver", driver)
      .option("dbtable", "host_metrics_num").load()
      .filter(graft.functions.IpFunctions.cidrContains(
        "10.0.0.16/28", col("host_num")))
    // scan metadata renders truncated at spark.sql.maxMetadataStringLength
    // (the upper bound got elided to "LessThanOrEqual(HOST_NUM,1677721..."
    // at the default 100), so assert on the untruncated relation filters
    val prev = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "1000")
    val scan = try stored.queryExecution.executedPlan.toString
      finally spark.conf.set("spark.sql.maxMetadataStringLength", prev)
    assert(scan.contains("GreaterThanOrEqual(HOST_NUM,167772176)") &&
      scan.contains("LessThanOrEqual(HOST_NUM,167772191)"),
      s"cidr range did not reach the JDBC scan as pushed comparisons:\n$scan")
    assert(stored.count() === 16L)
    // and the expression-side variant agrees on the kept host set
    assert(df.select("host").distinct().count() === 16L)
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
