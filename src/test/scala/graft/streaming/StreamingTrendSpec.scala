package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import StreamingTrend.{BucketCount, TrendState}

class StreamingTrendSpec extends SparkSuite {
  import spark.implicits._

  private def batchTrend(points: Seq[BucketCount]) = {
    val events = points.flatMap(p => Seq.fill(p.y.toInt)(
      (p.key, new Timestamp(p.bucket * 86400000L))))
      .toDF("key", "ts")
    graft.operators.Changepoint.trendEvents(events, "key", "ts", 86400L)
      .orderBy("key")
      .as[(String, Long, Double, Double)].collect().toSeq
  }

  private def latest(table: String): Seq[(String, Long, Double, Double)] =
    spark.table(table)
      .withColumn("seq", monotonically_increasing_id())
      .groupBy("key")
      .agg(max_by(struct(col("n_buckets"), col("slope"), col("intercept")),
        col("seq")).as("e"))
      .select(col("key"), col("e.n_buckets"), col("e.slope"), col("e.intercept"))
      .orderBy("key")
      .as[(String, Long, Double, Double)].collect().toSeq

  test("replay equals the batch kernel, late earlier buckets re-based exactly") {
    implicit val ctx = spark.sqlContext
    val a = Seq(BucketCount("a", 20010L, 2), BucketCount("a", 20011L, 4),
      BucketCount("a", 20012L, 6), BucketCount("a", 20013L, 8),
      BucketCount("a", 20008L, 5)) // LATE + EARLIER than the origin
    val b = Seq(BucketCount("b", 100L, 7), BucketCount("b", 103L, 7),
      BucketCount("b", 106L, 7))
    val in = MemoryStream[BucketCount]
    val query = StreamingTrend.perKey(in.toDS())
      .writeStream.format("memory").queryName("trend_stream")
      .outputMode("update").start()
    try {
      in.addData(a.take(2) ++ b.take(1): _*); query.processAllAvailable()
      in.addData(a.drop(2) ++ b.drop(1): _*); query.processAllAvailable()
      assert(latest("trend_stream") == batchTrend(a ++ b))
      // explicit: b is a flat line at 7 -> slope 0, intercept 7
      assert(latest("trend_stream").find(_._1 == "b").get ==
        (("b", 3L, 0.0, 7.0)))
    } finally query.stop()
  }

  test("origin re-basing transform is exact (unit-level)") {
    // fold in two orders: ascending buckets vs the same points with the
    // smallest bucket arriving last — states must be identical
    val pts = Seq((10L, 3L), (12L, 5L), (15L, 2L), (7L, 9L), (11L, 4L))
    def run(order: Seq[(Long, Long)]): TrendState =
      order.foldLeft(TrendState(order.head._1, 0, 0, 0, 0, 0)) {
        case (s, (b, y)) => StreamingTrend.fold(s, b, y)
      }
    val asc = run(pts.sortBy(_._1))
    val shuffled = run(pts)
    assert(asc == shuffled)
    assert(asc.origin == 7L && asc.n == 5L)
  }

  test("single-bucket key emits nothing until the slope is defined") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[BucketCount]
    val query = StreamingTrend.perKey(in.toDS())
      .writeStream.format("memory").queryName("trend_single")
      .outputMode("update").start()
    try {
      in.addData(BucketCount("k", 5L, 3)); query.processAllAvailable()
      assert(spark.table("trend_single").count() == 0)
      in.addData(BucketCount("k", 6L, 5)); query.processAllAvailable()
      assert(latest("trend_single") == Seq(("k", 2L, 2.0, 3.0)))
    } finally query.stop()
  }
}
