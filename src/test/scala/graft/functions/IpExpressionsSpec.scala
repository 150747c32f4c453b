package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class IpExpressionsSpec extends SparkSuite {
  import spark.implicits._

  test("native ip4_to_num parses and rejects malformed input as null") {
    val got = Seq("1.2.3.4", "0.0.0.0", "255.255.255.255", "256.1.1.1",
      "1.2.3", "a.b.c.d", "1.2.3.4.5", "")
      .toDF("ip")
      .select(IpExpressions.ip4ToNum(col("ip")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq == Seq(Some(16909060L), Some(0L), Some(4294967295L),
      None, None, None, None, None))
  }

  test("native dot product equals driver-side sequential fold") {
    val a = Array(0.5, -1.25, 3.0, 2.5)
    val b = Array(4.0, 0.125, -2.0, 1.5)
    val expect = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    val got = Seq((a, b)).toDF("a", "b")
      .select(IpExpressions.dot(col("a"), col("b"))).as[Double].head()
    assert(got == expect)
  }

  test("expressions registered in SQL via GraftExtensions") {
    val r = spark.sql(
      """SELECT graft_ip4_to_num('10.0.0.255') AS n,
        |  graft_num_to_ip4(16909060L) AS ip,
        |  graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d""".stripMargin)
      .collect().head
    assert(r.getLong(0) == 167772415L)
    assert(r.getString(1) == "1.2.3.4")
    assert(r.getDouble(2) == 11.0)
  }

  test("native expressions survive codegen paths (non-literal input)") {
    // force a real projection over rows, not constant folding
    val n = 1000
    val got = spark.range(n)
      .select(IpExpressions.ip4ToNum(
        IpExpressions.numToIp4(col("id") + 167772160L)).as("n"))
      .agg(sum(col("n"))).as[Long].head()
    assert(got == (0 until n).map(_ + 167772160L).sum)
  }
}
