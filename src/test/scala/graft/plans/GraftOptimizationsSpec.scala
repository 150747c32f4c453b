package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.IpExpressions

class GraftOptimizationsSpec extends SparkSuite {
  import spark.implicits._

  test("ip codec roundtrip optimizes to a bitmask, same values") {
    val df = spark.range(5)
      .select(IpExpressions.ip4ToNum(
        IpExpressions.numToIp4(col("id") + 167772160L)).as("n"))
    // the optimized plan must not contain either codec expression
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("graft_ip4_to_num") && !opt.contains("graft_num_to_ip4"),
      s"roundtrip not eliminated:\n$opt")
    assert(opt.contains("& 4294967295"), s"mask missing:\n$opt")
    assert(df.as[Long].collect().toSeq ==
      (0 until 5).map(_ + 167772160L))
  }

  test("mask semantics hold for out-of-range and negative longs") {
    val vals = Seq(0L, 4294967295L, 4294967296L, -1L, 1L << 40)
    val got = vals.toDF("x")
      .select(IpExpressions.ip4ToNum(IpExpressions.numToIp4(col("x"))))
      .as[Long].collect().toSeq
    assert(got == vals.map(_ & 4294967295L))
  }

  test("single codec calls are untouched") {
    val df = spark.range(3)
      .select(IpExpressions.numToIp4(col("id") + 167772160L).as("ip"))
    assert(df.queryExecution.optimizedPlan.toString.contains("graft_num_to_ip4"))
    assert(df.as[String].collect().head == "10.0.0.0")
  }
}
