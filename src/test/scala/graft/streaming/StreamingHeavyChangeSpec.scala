package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import StreamingHeavyChange.KeyEvent

class StreamingHeavyChangeSpec extends SparkSuite {
  import spark.implicits._

  private val bucketSec = 60L

  private def streamed(batches: Seq[Seq[KeyEvent]], name: String)
      : Map[String, (Long, Long, Long, Long, Double, Long)] = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[KeyEvent]
    val query = StreamingHeavyChange.deltas(in.toDS(), bucketSec)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      batches.foreach { b => in.addData(b: _*); query.processAllAvailable() }
      spark.table(name)
        .withColumn("seq", monotonically_increasing_id())
        .groupBy("key")
        .agg(max_by(struct(col("bucket"), col("n_cur"), col("n_prev"),
          col("delta"), col("ratio"), col("n_late")), col("seq")).as("d"))
        .select(col("key"), col("d.bucket"), col("d.n_cur"), col("d.n_prev"),
          col("d.delta"), col("d.ratio"), col("d.n_late"))
        .as[(String, Long, Long, Long, Long, Double, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    } finally query.stop()
  }

  private def us(minute: Long, i: Long = 0L): Long =
    minute * 60000000L + i * 1000L

  test("replay equals the tumbling-bucket recompute under any split") {
    // per key: a ramp, a drop, a steady line, a new talker — every
    // delta sign, uneven bucket populations
    val evs =
      (1 to 3).map(i => KeyEvent("ramp", us(10, i))) ++
      (1 to 9).map(i => KeyEvent("ramp", us(11, i))) ++
      (1 to 8).map(i => KeyEvent("drop", us(10, i))) ++
      (1 to 2).map(i => KeyEvent("drop", us(11, i))) ++
      (1 to 4).map(i => KeyEvent("steady", us(10, i))) ++
      (1 to 4).map(i => KeyEvent("steady", us(11, i))) ++
      (1 to 5).map(i => KeyEvent("fresh", us(11, i)))
    val got = streamed(Seq(evs.take(7), evs.slice(7, 20), evs.drop(20)),
      "hc_stream")

    // independent reference: per-key bucket counts computed on the
    // driver, final state = (last bucket, its count, count of last-1)
    val expected = evs.groupBy(_.key).map { case (k, es) =>
      val byBucket = es.groupBy(e => e.tsUs / 60000000L).view
        .mapValues(_.size.toLong).toMap
      val last = byBucket.keys.max
      val (nc, np) = (byBucket(last), byBucket.getOrElse(last - 1, 0L))
      k -> ((last, nc, np, nc - np,
        java.math.BigDecimal.valueOf(nc / (np + 1.0))
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue(), 0L))
    }
    assert(got == expected)
    assert(got("ramp")._4 == 6L && got("drop")._4 == -6L &&
      got("steady")._4 == 0L && got("fresh")._4 == 5L)
  }

  test("a gap bucket zeroes the previous count") {
    val evs = (1 to 3).map(i => KeyEvent("k", us(10, i))) ++
      (1 to 2).map(i => KeyEvent("k", us(13, i))) // buckets 11-12 empty
    val got = streamed(Seq(evs), "hc_gap")
    assert(got("k") == ((13L, 2L, 0L, 2L, 2.0, 0L)))
  }

  test("one bucket of lateness folds exactly; older is counted and excluded") {
    val b1 = Seq(KeyEvent("k", us(10)), KeyEvent("k", us(11, 1)),
      KeyEvent("k", us(11, 2)))
    // late for bucket 10 (now the previous): folds into n_prev exactly;
    // late for bucket 9: the window left the state, meter ticks
    val b2 = Seq(KeyEvent("k", us(10, 5)), KeyEvent("k", us(9, 1)))
    val got = streamed(Seq(b1, b2), "hc_late")
    assert(got("k") == ((11L, 2L, 2L, 0L, 0.666667, 1L)),
      s"got ${got("k")}")
  }
}
