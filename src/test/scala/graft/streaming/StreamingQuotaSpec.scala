package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Sampling
import StreamingQuota.Doc

class StreamingQuotaSpec extends SparkSuite {
  import spark.implicits._

  test("converges to the batch quota set regardless of batching; replay-safe") {
    implicit val ctx = spark.sqlContext
    val rng = new scala.util.Random(23)
    val docs = rng.shuffle((1 to 150).map(i =>
      Doc(s"s${i % 3}", i.toLong)).toList)

    val in = MemoryStream[Doc]
    val query = StreamingQuota.quota(in.toDS(), n = 12)
      .writeStream.format("memory").queryName("quota_stream")
      .outputMode("update").start()
    try {
      docs.grouped(40).foreach { b =>
        in.addData(b: _*); query.processAllAvailable() }
      // replay an arbitrary slice: the quota must not change
      in.addData(docs.take(30): _*); query.processAllAvailable()

      // latest emission per (src, pos), keep only live positions
      val streamed = spark.table("quota_stream")
        .withColumn("seq", monotonically_increasing_id())
        .groupBy("src", "pos")
        .agg(max_by(col("id"), col("seq")).as("id"))
        .as[(String, Int, Long)].collect()
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap

      val batch = Sampling.quotaSample(
          docs.map(d => (d.id, d.src)).toDF("doc_id", "src"),
          "src", "doc_id", 12)
        .as[(Long, String)].collect()
        .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap

      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (src, ids) =>
        assert(ids.length == 12)
        assert(ids.toSet == batch(src),
          s"$src: stream ${ids.toSet} != batch ${batch(src)}")
      }
    } finally query.stop()
  }
}
