package graft.operators

import graft.SparkSuite

class AutocorrSpec extends SparkSuite {
  import spark.implicits._

  /** Independent reference: the same pair-sum Pearson in driver-side
    * BigInt + Double arithmetic.
    */
  private def refAcf(series: Seq[(String, Long, Long)],
      lags: Seq[Int]): Map[(String, Int), (Long, Option[Double])] = {
    val byKey = series.groupBy(_._1)
    (for {
      (key, rows) <- byKey.toSeq
      byT = rows.map { case (_, t, x) => t -> x }.toMap
      lag <- lags
    } yield {
      val pairs = byT.toSeq.flatMap { case (t, x) =>
        byT.get(t + lag).map(y => (BigInt(x), BigInt(y))) }
      val n = BigInt(pairs.size)
      val sx = pairs.map(_._1).sum
      val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val d1 = (n * sxx - sx * sx).toDouble
      val d2 = (n * syy - sy * sy).toDouble
      val r = if (d1 > 0.0 && d2 > 0.0)
        Some(BigDecimal((n * sxy - sx * sy).toDouble /
            (math.sqrt(d1) * math.sqrt(d2)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      else None
      (key, lag) -> (pairs.size.toLong, r)
    }).toMap
  }

  private def run(series: Seq[(String, Long, Long)],
      lags: Seq[Int]): Map[(String, Int), (Long, Option[Double])] =
    Autocorr.acf(series.toDF("key", "t", "x"), "key", "t", "x", lags)
      .as[(String, Int, Long, Option[Double])].collect()
      .map { case (k, l, n, r) => (k, l) -> (n, r) }.toMap

  test("period-2 alternating series: r = -1 at lag 1, +1 at lag 2") {
    val s = (0L until 40L).map(t => ("a", t, if (t % 2 == 0) 10L else 30L))
    val got = run(s, Seq(1, 2))
    assert(got(("a", 1))._2.get == -1.0)
    assert(got(("a", 2))._2.get == 1.0)
  }

  test("constant series has zero variance: r is NULL, pairs still counted") {
    val s = (0L until 10L).map(t => ("c", t, 7L))
    val got = run(s, Seq(1, 3))
    assert(got(("c", 1)) == (9L, None))
    assert(got(("c", 3)) == (7L, None))
  }

  test("gaps self-select out: missing t+lag forms no pair") {
    // t = 0,1,2,10,11 — lag 1 pairs: (0,1),(1,2),(10,11) = 3, never
    // a (2,10) pair (a row-lag window would have paired across the gap)
    val s = Seq(0L, 1L, 2L, 10L, 11L).map(t => ("g", t, t * t))
    val got = run(s, Seq(1))
    assert(got(("g", 1))._1 == 3L)
  }

  test("matches the BigInt reference on a noisy multi-key series") {
    val s = for {
      key <- Seq("k1", "k2"); t <- 0L until 60L
    } yield (key, t,
      1000L + (t % 7) * 131L + (t * t % 13) * 17L +
        (if (key == "k2") (t % 24) * 997L else 0L))
    val lags = Seq(1, 2, 3, 7, 24)
    assert(run(s, lags) == refAcf(s, lags))
  }

  test("strong period-24 series peaks at lag 24") {
    val s = (0L until 240L).map(t =>
      ("d", t, 5000L + (if (t % 24 < 12) 1000L else -1000L) + (t % 5)))
    val got = run(s, Seq(1, 12, 24))
    assert(got(("d", 24))._2.get > 0.9)
    assert(got(("d", 12))._2.get < 0.0)
  }

  test("rejects non-positive lags") {
    intercept[IllegalArgumentException] {
      Autocorr.acf(Seq(("a", 1L, 1L)).toDF("key", "t", "x"),
        "key", "t", "x", Seq(0))
    }
  }

  private def runCcf(xs: Seq[(String, Long, Long)],
      ys: Seq[(String, Long, Long)], lags: Seq[Int])
      : Map[(String, Int), (Long, Option[Double])] =
    Autocorr.ccf(xs.toDF("key", "t", "v"), ys.toDF("key", "t", "v"),
        "key", "t", "v", lags)
      .as[(String, Int, Long, Option[Double])].collect()
      .map { case (k, l, n, r) => (k, l) -> (n, r) }.toMap

  test("ccf: a shifted copy correlates perfectly at the planted lag") {
    val xs = (0L until 50L).map(t => ("s", t, 100L + (t * t) % 37))
    val ys = xs.map { case (k, t, v) => (k, t + 3, v) }  // y(t) = x(t-3)
    val got = runCcf(xs, ys, Seq(1, 3, 5))
    assert(got(("s", 3)) == (50L, Some(1.0)))
    assert(got(("s", 1))._2.get < 1.0)
  }

  test("ccf: ccf(x,y,k) == ccf(y,x,-k), zero lag is plain correlation") {
    val xs = (0L until 30L).map(t => ("k", t, (t % 11) * 13L))
    val ys = (0L until 30L).map(t => ("k", t, 500L - (t % 7) * 29L))
    val ab = runCcf(xs, ys, Seq(-2, 0, 2))
    val ba = runCcf(ys, xs, Seq(-2, 0, 2))
    assert(ab(("k", 2)) == ba(("k", -2)))
    assert(ab(("k", -2)) == ba(("k", 2)))
    assert(ab(("k", 0)) == ba(("k", 0)))
  }

  test("ccf: rejects duplicate or empty lag sets") {
    val df = Seq(("a", 1L, 1L)).toDF("key", "t", "v")
    intercept[IllegalArgumentException] {
      Autocorr.ccf(df, df, "key", "t", "v", Seq(1, 1))
    }
    intercept[IllegalArgumentException] {
      Autocorr.ccf(df, df, "key", "t", "v", Nil)
    }
  }
}
