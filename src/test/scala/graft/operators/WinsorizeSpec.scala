package graft.operators

import graft.SparkSuite

class WinsorizeSpec extends SparkSuite {
  import spark.implicits._

  private def ref(vals: Seq[Long], pLo: Int, pHi: Int)
      : (Long, Long, Long, Long, Long, Double, Double) = {
    val sorted = vals.sorted
    val n = vals.size.toLong
    def idx(p: Int) = math.min(math.max((n * p + 999) / 1000, 1L), n)
    val lo = sorted((idx(pLo) - 1).toInt)
    val hi = sorted((idx(pHi) - 1).toInt)
    val w = vals.map(v => math.min(math.max(v, lo), hi)).map(BigInt(_))
    val sw = w.sum
    val sww = w.map(x => x * x).sum
    val mean = BigDecimal(sw.toDouble / n.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val std = BigDecimal(
        math.sqrt((BigInt(n) * sww - sw * sw).toDouble) / n.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (n, lo, hi, vals.count(_ < lo).toLong, vals.count(_ > hi).toLong,
      mean, std)
  }

  private def run(rows: Seq[(String, Long)], pLo: Int, pHi: Int)
      : Map[String, (Long, Long, Long, Long, Long, Double, Double)] =
    Winsorize.stats(rows.toDF("key", "v"), "key", "v", pLo, pHi)
      .as[(String, Long, Long, Long, Long, Long, Double, Double)]
      .collect()
      .map { case (k, n, lo, hi, cl, ch, m, s) =>
        k -> (n, lo, hi, cl, ch, m, s) }.toMap

  test("clamps exactly the tails outside the discrete band") {
    // 1..100: p05 -> position 5 (value 5), p95 -> position 95 (value 95)
    val vals = (1L to 100L)
    val got = run(vals.map(("a", _)), 50, 950)
    val (n, lo, hi, cl, ch, _, _) = got("a")
    assert((n, lo, hi) == (100L, 5L, 95L))
    assert((cl, ch) == (4L, 5L))  // 1-4 below, 96-100 above
  }

  test("matches the BigInt/IEEE reference per group, outliers included") {
    val g1 = Seq.tabulate(200)(i => (i % 13) * 7L + (i % 5)) ++
      Seq(1000000L, -999999L)  // extreme outliers both sides
    val g2 = Seq.tabulate(57)(i => 100L - i)
    val rows = g1.map(("g1", _)) ++ g2.map(("g2", _))
    val got = run(rows, 50, 950)
    assert(got("g1") == ref(g1, 50, 950))
    assert(got("g2") == ref(g2, 50, 950))
  }

  test("constant group: zero clipping, std 0") {
    val got = run(Seq.fill(9)(("c", 42L)), 100, 900)
    assert(got("c") == (9L, 42L, 42L, 0L, 0L, 42.0, 0.0))
  }

  test("single-element group is its own band") {
    val got = run(Seq(("s", 17L)), 50, 950)
    assert(got("s") == (1L, 17L, 17L, 0L, 0L, 17.0, 0.0))
  }

  test("tiny group indices clamp to [1, n]") {
    // n=3: ilo = ceil(0.05*3)=1, ihi = ceil(0.95*3)=3
    val got = run(Seq(("t", 10L), ("t", 20L), ("t", 30L)), 50, 950)
    assert(got("t")._2 == 10L && got("t")._3 == 30L)
  }

  test("rejects inverted or out-of-range bands") {
    intercept[IllegalArgumentException] {
      Winsorize.stats(Seq(("a", 1L)).toDF("key", "v"), "key", "v", 900, 100)
    }
    intercept[IllegalArgumentException] {
      Winsorize.stats(Seq(("a", 1L)).toDF("key", "v"), "key", "v", 0, 950)
    }
  }
}
