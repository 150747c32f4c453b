package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import StreamingTopK.Scored

class StreamingTopKSpec extends SparkSuite {
  import spark.implicits._

  test("cross-batch leaderboard equals the batch graft_topk aggregate") {
    implicit val ctx = spark.sqlContext
    // ties on value (ids 11 vs 4 at 5.0) exercise the id ASC retention
    val evs = Seq(
      Scored("g1", 1L, 3.0), Scored("g1", 2L, 9.0), Scored("g1", 3L, 1.0),
      Scored("g1", 4L, 5.0), Scored("g2", 5L, 2.0), Scored("g1", 6L, 7.0),
      Scored("g1", 7L, 4.0), Scored("g1", 11L, 5.0), Scored("g2", 8L, 8.0),
      Scored("g1", 9L, 6.0), Scored("g2", 10L, 2.5))
    val (b1, b2) = evs.splitAt(5)

    val in = MemoryStream[Scored]
    val query = StreamingTopK.topK(in.toDS(), k = 3)
      .writeStream.format("memory").queryName("topk_stream")
      .outputMode("update").start()
    try {
      in.addData(b1: _*); query.processAllAvailable()
      in.addData(b2: _*); query.processAllAvailable()

      // keep only the LAST emission per (grp, pos): the memory sink
      // appends every update in arrival order, so max_by over an
      // append-order sequence id picks the freshest row
      val streamed = spark.table("topk_stream")
        .withColumn("seq", monotonically_increasing_id())
        .groupBy("grp", "pos")
        .agg(max_by(struct(col("id"), col("value")), col("seq")).as("e"))
        .select(col("grp"), col("pos"), col("e.id").as("id"),
          col("e.value").as("value"))
        .orderBy("grp", "pos")
        .as[(String, Int, Long, Double)].collect().toSeq

      val batch = evs.toDS().toDF()
        .groupBy("grp")
        .agg(expr("graft_topk(value, id, 3)").as("top"))
        .select(col("grp"), posexplode(col("top")).as(Seq("pos", "e")))
        .select(col("grp"), col("pos"), col("e.id").as("id"),
          col("e.value").as("value"))
        .orderBy("grp", "pos")
        .as[(String, Int, Long, Double)].collect().toSeq

      assert(streamed == batch)
      // explicit arithmetic: g1 top-3 = (9.0, id 2), (7.0, id 6), (6.0, id 9)
      assert(batch.filter(_._1 == "g1") ==
        Seq(("g1", 0, 2L, 9.0), ("g1", 1, 6L, 7.0), ("g1", 2, 9L, 6.0)))
    } finally query.stop()
  }

  test("value ties evict the larger id (value DESC, id ASC retention)") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Scored]
    val query = StreamingTopK.topK(in.toDS(), k = 2)
      .writeStream.format("memory").queryName("topk_ties")
      .outputMode("update").start()
    try {
      in.addData(Scored("g", 5L, 1.0), Scored("g", 3L, 1.0))
      query.processAllAvailable()
      in.addData(Scored("g", 4L, 1.0)) // displaces id 5, not id 3
      query.processAllAvailable()
      val last2 = spark.table("topk_ties")
        .withColumn("seq", monotonically_increasing_id())
        .groupBy("pos").agg(max_by(col("id"), col("seq")).as("id"))
        .orderBy("pos").as[(Int, Long)].collect().toSeq
      assert(last2 == Seq((0, 3L), (1, 4L)))
    } finally query.stop()
  }
}
