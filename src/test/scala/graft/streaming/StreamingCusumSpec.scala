package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import StreamingCusum.Tick

class StreamingCusumSpec extends SparkSuite {
  import spark.implicits._

  /** Last emission per (key, bucket) from the update-mode memory sink. */
  private def latest(table: String): Seq[(String, Long, Long, Long, Int)] =
    spark.table(table)
      .withColumn("seq", monotonically_increasing_id())
      .groupBy("key", "bucket")
      .agg(max_by(struct(col("x"), col("cusum"), col("alarm")), col("seq")).as("e"))
      .select(col("key"), col("bucket"), col("e.x"), col("e.cusum"), col("e.alarm"))
      .orderBy("key", "bucket")
      .as[(String, Long, Long, Long, Int)].collect().toSeq

  private def batchOf(ticks: Seq[Tick], k: Long, h: Long) = {
    val counts = ticks.toDS().toDF()
      .groupBy("key", "bucket").agg(count(lit(1)).as("x"))
    graft.operators.Changepoint
      .cusumSeries(counts, "key", "bucket", "x", k, h)
      .orderBy("key", "bucket")
      .as[(String, Long, Long, Long, Int)].collect().toSeq
  }

  private def ticksOf(key: String, bucketCounts: Seq[(Long, Int)]): Seq[Tick] =
    bucketCounts.flatMap { case (b, n) => Seq.fill(n)(Tick(key, b)) }

  test("in-order replay equals the batch closed form, split buckets included") {
    implicit val ctx = spark.sqlContext
    val a = ticksOf("a", Seq(0L -> 9, 1L -> 2, 2L -> 12, 3L -> 12, 4L -> 1))
    val b = ticksOf("b", Seq(0L -> 3, 2L -> 8))
    // bucket 2 of key a splits across batches: 7 events then 5 more —
    // the allowance must still be charged once for that bucket
    val batch1 = a.filter(_.bucket < 2) ++ ticksOf("a", Seq(2L -> 7)) ++
      b.filter(_.bucket == 0L)
    val batch2 = ticksOf("a", Seq(2L -> 5)) ++ a.filter(_.bucket > 2) ++
      b.filter(_.bucket == 2L)

    val in = MemoryStream[Tick]
    val query = StreamingCusum.perKey(in.toDS(), allowance = 5L, threshold = 8L)
      .writeStream.format("memory").queryName("cusum_stream")
      .outputMode("update").start()
    try {
      in.addData(batch1: _*); query.processAllAvailable()
      in.addData(batch2: _*); query.processAllAvailable()
      assert(latest("cusum_stream") == batchOf(a ++ b, 5L, 8L))
    } finally query.stop()
  }

  test("ticks derivation matches the batch query's keying") {
    implicit val ctx = spark.sqlContext
    val events = Seq(
      (65793L, java.sql.Timestamp.valueOf("2024-01-01 10:30:00")),
      (65794L, java.sql.Timestamp.valueOf("2024-01-01 10:59:00")),
      (131329L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00")))
      .toDF("user_id", "ts")
      .withColumn("host", graft.queries.Shared.hostOf(col("user_id")))
    val ticks = StreamingCusum.ticks(events, "host", "ts", 24, 3600L)
      .collect().toSeq.sortBy(t => (t.key, t.bucket))
    // 65793 = 0x010101 -> 10.1.1.1 -> /24 10.1.1.0 ; hour of 2024-01-01T10
    assert(ticks.map(_.key) == Seq("10.1.1.0", "10.1.1.0", "10.2.1.0"))
    assert(ticks(0).bucket == ticks(1).bucket)
    assert(ticks(2).bucket == ticks(0).bucket + 1)
  }

  test("late buckets fold into the current bucket (mass never dropped)") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Tick]
    val query = StreamingCusum.perKey(in.toDS(), allowance = 2L, threshold = 100L)
      .writeStream.format("memory").queryName("cusum_late")
      .outputMode("update").start()
    try {
      in.addData(ticksOf("k", Seq(0L -> 3, 1L -> 3)): _*)
      query.processAllAvailable()
      in.addData(ticksOf("k", Seq(0L -> 4)): _*) // late: folds into bucket 1
      query.processAllAvailable()
      val rows = latest("cusum_late")
      // bucket 1 carries x = 3 + 4 (late mass), cusum = (3-2) + (7-2) = 6
      assert(rows == Seq(("k", 0L, 3L, 1L, 0), ("k", 1L, 7L, 6L, 0)))
    } finally query.stop()
  }
}
