package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Autocorr
import StreamingAcf.Obs

class StreamingAcfSpec extends SparkSuite {
  import spark.implicits._

  private val lags = Seq(1, 2, 5)

  // gapped, noisy two-key series on the micro ladder
  private val series: Seq[Obs] = for {
    key <- Seq("a", "b")
    t <- 0L until 80L
    if t % 11 != 3  // gaps
  } yield Obs(key, t,
    1000000L + (t % 7) * 131000L + (t * t % 13) * 17000L +
      (if (key == "b") (t % 24) * 997000L else 0L))

  private def batchRows: Map[(String, Int), (Long, Option[Double])] =
    Autocorr.acf(series.toDF("key", "t", "x"), "key", "t", "x", lags)
      .as[(String, Int, Long, Option[Double])].collect()
      .map { case (k, l, n, r) => (k, l) -> (n, r) }.toMap

  private def lastEmits(batches: Seq[Seq[Obs]])
      : Map[(String, Int), (Long, Option[Double], Long, Long)] = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Obs]
    val name = s"acf_stream_${System.nanoTime()}"
    val q = StreamingAcf.acf(in.toDS(), lags)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      spark.table(name)
        .withColumn("seq", monotonically_increasing_id())
        .groupBy("key", "lag")
        .agg(max_by(struct(col("n_pairs"), col("r"), col("n_late"),
          col("n_dup")), col("seq")).as("m"))
        .select(col("key"), col("lag"), col("m.n_pairs"), col("m.r"),
          col("m.n_late"), col("m.n_dup"))
        .as[(String, Int, Long, Option[Double], Long, Long)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    } finally q.stop()
  }

  test("in-order replay across uneven splits equals the batch operator") {
    val ordered = series.sortBy(o => (o.t, o.key))
    val got = lastEmits(Seq(ordered.take(23), ordered.slice(23, 90),
      ordered.drop(90)))
    val want = batchRows
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (n, r, late, dup)) =>
      assert((n, r) == want(k), s"$k diverged from batch")
      assert(late == 0L && dup == 0L, s"$k meters: late=$late dup=$dup")
    }
  }

  test("out-of-order within the lag horizon is still exact") {
    // deterministic shuffle that displaces rows by up to ~4 buckets
    // (< maxLag=5): sort by (t + (t*7 % 4)), split unevenly
    val jittered = series.sortBy(o => (o.t + (o.t * 7 % 4), o.key))
    val got = lastEmits(Seq(jittered.take(40), jittered.slice(40, 41),
      jittered.drop(41)))
    val want = batchRows
    got.foreach { case (k, (n, r, late, dup)) =>
      assert((n, r) == want(k), s"$k diverged under reorder")
      assert(late == 0L && dup == 0L)
    }
  }

  test("beyond-horizon lateness is counted and excluded, never folded") {
    val onTime = Seq(Obs("k", 0L, 100L), Obs("k", 1L, 200L),
      Obs("k", 20L, 300L), Obs("k", 21L, 400L))
    val late = Obs("k", 2L, 999L)  // maxT=21, horizon 5: 2 <= 16 -> late
    val got = lastEmits(Seq(onTime, Seq(late)))
    val want = Autocorr.acf(onTime.toDF("key", "t", "x"),
        "key", "t", "x", lags)
      .as[(String, Int, Long, Option[Double])].collect()
      .map { case (k, l, n, r) => (k, l) -> (n, r) }.toMap
    got.foreach { case (k, (n, r, lateN, dup)) =>
      // the batch operator emits no row for a lag with zero pairs;
      // the stream emits (0, None) — both mean "no pairs"
      assert((n, r) == want.getOrElse(k, (0L, None)))
      assert(lateN == 1L && dup == 0L)
    }
  }

  test("duplicate buckets are counted and ignored (first wins)") {
    val rows = Seq(Obs("k", 0L, 100L), Obs("k", 1L, 200L),
      Obs("k", 2L, 300L))
    val got = lastEmits(Seq(rows, Seq(Obs("k", 1L, 777L))))
    val want = Autocorr.acf(rows.toDF("key", "t", "x"),
        "key", "t", "x", lags)
      .as[(String, Int, Long, Option[Double])].collect()
      .map { case (k, l, n, r) => (k, l) -> (n, r) }.toMap
    got.foreach { case (k, (n, r, late, dup)) =>
      assert((n, r) == want.getOrElse(k, (0L, None)))
      assert(dup == 1L && late == 0L)
    }
  }

  test("large micro-sum values do not wrap the 128-bit cells") {
    // hourly micro sums near 1e10: x*x ~ 1e20 > Long.MaxValue — the
    // limb pairs must carry; parity with the batch decimal(38,0) sums
    val big = (0L until 30L).map(t =>
      Obs("big", t, 10000000000L + t * 123456789L))
    val got = lastEmits(Seq(big.take(11), big.drop(11)))
    val want = Autocorr.acf(big.toDF("key", "t", "x"),
        "key", "t", "x", lags)
      .as[(String, Int, Long, Option[Double])].collect()
      .map { case (k, l, n, r) => (k, l) -> (n, r) }.toMap
    got.foreach { case (k, (n, r, _, _)) =>
      assert((n, r) == want(k), s"$k wrapped") }
  }
}
