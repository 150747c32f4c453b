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

  test("persisted corpus band index joins each increment with a one-sided shuffle") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val dir = "/root/testdata/sf0.001"
    Seq("b_corpus_bands", "p_inc_bands").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val d = new java.io.File(s"/tmp/graft-warehouse/$t")
      if (d.exists()) { d.listFiles().foreach(_.delete()); d.delete() }
    }
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    // the SCALING.md claim made concrete: the corpus band index is
    // written ONCE, bucketed by its join key (the band-qualified
    // bucket hash); each increment then co-locates against it and
    // only the (small) increment side shuffles
    def bandKey(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), concat_ws("_", col("band"), col("bh")).as("bk"))
    val corpusBands = bandKey(Dedup.bandHashes(Dedup.minhashSignatures(
      Dedup.shingleSets(docs, "doc_id", "text", 3))))
    Bucketing.writeBucketed(corpusBands, "b_corpus_bands", "bk", 4)
    val incoming = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 900000L).as("doc_id"), col("text"))
    bandKey(Dedup.bandHashes(Dedup.minhashSignatures(
        Dedup.shingleSets(incoming, "doc_id", "text", 3))))
      .write.mode("overwrite").format("parquet").saveAsTable("p_inc_bands")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("p_inc_bands").as("x")
        .join(spark.table("b_corpus_bands").as("y"), "bk")
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      assert(joined.count() > 0) // the increment IS made of corpus copies
      val plan = joined.queryExecution.executedPlan.toString
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(shuffles == 1,
        s"expected only the increment side to shuffle, got $shuffles:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
