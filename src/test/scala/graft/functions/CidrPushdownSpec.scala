package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.IpFunctions.Cidr

class CidrPushdownSpec extends SparkSuite {
  import spark.implicits._

  test("cidr_contains on a stored numeric IP pushes into the parquet scan") {
    val path = "/tmp/graft-ipnum-parquet"
    (0L until 10000L).map(i => (i, 167772160L + i))
      .toDF("id", "ip_num")
      .write.mode("overwrite").parquet(path)

    val cidr = Cidr.parse("10.0.2.0/24")
    val df = spark.read.parquet(path)
      .filter(IpFunctions.cidrContains(cidr, col("ip_num")))
    assert(df.count() == 256)

    val scan = df.queryExecution.executedPlan.toString
    val pushed = "PushedFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(scan).map(_.group(1)).getOrElse("")
    assert(pushed.contains("GreaterThanOrEqual(ip_num") &&
      pushed.contains("LessThanOrEqual(ip_num"),
      s"range not pushed; PushedFilters=[$pushed]")
  }
}
