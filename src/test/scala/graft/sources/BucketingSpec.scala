package graft.sources

import graft.SparkSuite

class BucketingSpec extends SparkSuite {

  test("bucketed equi-join runs without a shuffle on either side") {
    val dir = "/root/testdata/sf0.001"
    // in-memory catalog forgets tables across JVMs but the warehouse
    // dirs persist; clear both before writing
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val d = new java.io.File(s"/tmp/graft-warehouse/$t")
      if (d.exists()) {
        d.listFiles().foreach(_.delete()); d.delete()
      }
    }
    val orders = Tables.load(spark, dir, "orders")
    val lineitem = Tables.load(spark, dir, "lineitem")
    Bucketing.writeBucketed(
      orders.select("o_orderkey", "o_totalprice"), "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(
      lineitem.select("l_orderkey", "l_quantity")
        .withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", 4)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.coLocatedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val n = joined.count()
      // same row count as the plain join
      val expect = orders.join(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey").count()
      assert(n == expect && n > 0)
      // and no exchange anywhere in the executed plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
