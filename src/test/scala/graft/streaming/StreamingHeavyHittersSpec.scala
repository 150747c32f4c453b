package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import StreamingHeavyHitters.Item

class StreamingHeavyHittersSpec extends SparkSuite {
  import spark.implicits._

  test("under-k domains: streaming counts are exact and match the batch agg across batches") {
    implicit val ctx = spark.sqlContext
    val batch1 = Seq.fill(5)(Item("g1", "a")) ++ Seq.fill(3)(Item("g1", "b")) ++
      Seq.fill(2)(Item("g2", "x"))
    val batch2 = Seq.fill(4)(Item("g1", "b")) ++ Seq.fill(1)(Item("g2", "x"))

    val in = MemoryStream[Item]
    val query = StreamingHeavyHitters.topK(in.toDF(), k = 8)
      .writeStream.format("memory").queryName("hh_stream").outputMode("update")
      .start()
    try {
      in.addData(batch1: _*)
      query.processAllAvailable()
      in.addData(batch2: _*)
      query.processAllAvailable()

      // the LAST emission per (grp, item) carries the cumulative count
      val finalCounts = spark.table("hh_stream")
        .groupBy("grp", "item")
        .agg(org.apache.spark.sql.functions.max("count").as("count"))
        .as[(String, String, Long)].collect()
        .map { case (g, i, c) => (g, i) -> c }.toMap
      assert(finalCounts == Map(
        ("g1", "a") -> 5L, ("g1", "b") -> 7L, ("g2", "x") -> 3L))
    } finally query.stop()
  }

  test("state stays bounded at k and the true heavy hitter survives") {
    implicit val ctx = spark.sqlContext
    // 40 occurrences of "hot" + 30 singleton items, k=4:
    // freq(hot)=40 > n/(k+1)=14 -> MG guarantees presence
    val noise = (0 until 30).map(i => Item("g", s"n$i"))
    val rows = Seq.fill(40)(Item("g", "hot")) ++ noise

    val in = MemoryStream[Item]
    val query = StreamingHeavyHitters.topK(in.toDF(), k = 4)
      .writeStream.format("memory").queryName("hh_bound").outputMode("update")
      .start()
    try {
      in.addData(rows: _*)
      query.processAllAvailable()
      val out = spark.table("hh_bound")
        .as[StreamingHeavyHitters.TopItem].collect()
      assert(out.length <= 4, s"state leaked past k: ${out.length}")
      val hot = out.find(_.item == "hot").get
      assert(hot.pos == 0)
      // undercount bounded by n/(k+1) = 14
      assert(hot.count >= 40L - 14L && hot.count <= 40L)
    } finally query.stop()
  }
}
