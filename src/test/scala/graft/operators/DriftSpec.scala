package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class DriftSpec extends SparkSuite {
  import spark.implicits._

  test("ksStatistic: hand-computed ladder, integer-exact") {
    // a = {1,2,3,4}, b = {3,4,5,6}: F_a - F_b peaks at x in [2,3):
    // cum_a=2, cum_b=0 → |2*4 - 0*4| = 8, ks = 8/16 = 0.5
    val a = Seq(1, 2, 3, 4).map(v => ("g", v.toDouble)).toDF("grp", "v")
    val b = Seq(3, 4, 5, 6).map(v => ("g", v.toDouble)).toDF("grp", "v")
    val got = Drift.ksStatistic(a, b, "grp", "v")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("g", 4L, 4L, 8L, 0.5)))
  }

  test("ksStatistic: identical samples give zero, disjoint give one") {
    val x = (1 to 100).map(v => ("g", (v % 13).toDouble)).toDF("grp", "v")
    val same = Drift.ksStatistic(x, x, "grp", "v")
      .select("d_num", "ks").as[(Long, Double)].head()
    assert(same == ((0L, 0.0)))

    val lo = (1 to 50).map(v => ("g", v.toDouble)).toDF("grp", "v")
    val hi = (1 to 50).map(v => ("g", (v + 100).toDouble)).toDF("grp", "v")
    val apart = Drift.ksStatistic(lo, hi, "grp", "v")
      .select("ks").as[Double].head()
    assert(apart == 1.0)
  }

  test("ksStatistic: ties across sides merge into one ladder rung") {
    // duplicated values on both sides; independent groups isolated
    val a = Seq(("g", 1.0), ("g", 1.0), ("g", 2.0), ("h", 5.0))
      .toDF("grp", "v")
    val b = Seq(("g", 1.0), ("g", 2.0), ("g", 2.0), ("h", 5.0))
      .toDF("grp", "v")
    val got = Drift.ksStatistic(a, b, "grp", "v")
      .orderBy("grp")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    // g: at v=1 |2*3 - 1*3| = 3 → ks = 3/9; h: identical → 0
    assert(got == Seq(("g", 3L, 3L, 3L, 3.0 / 9.0), ("h", 1L, 1L, 0L, 0.0)))
  }

  test("split variants equal the two-frame forms row-for-row") {
    val rng = new scala.util.Random(19)
    val rows = (1 to 800).map(i =>
      (s"g${rng.nextInt(3)}", rng.nextDouble() * 40, i % 2 == 0))
    val df = rows.toDF("grp", "v", "is_a")
    val a = df.filter(col("is_a")).select("grp", "v")
    val b = df.filter(!col("is_a")).select("grp", "v")

    val ks2 = Drift.ksStatistic(a, b, "grp", "v")
      .orderBy("grp").collect().toSeq
    val ks1 = Drift.ksStatisticSplit(df, col("is_a"), "grp", "v")
      .orderBy("grp").collect().toSeq
    assert(ks1 == ks2)

    val psi2 = Drift.psi(a, b, "grp", "v", nBins = 6)
      .orderBy("grp", "bin").collect().toSeq
    val psi1 = Drift.psiSplit(df, col("is_a"), "grp", "v", nBins = 6)
      .orderBy("grp", "bin").collect().toSeq
    assert(psi1 == psi2)
  }

  test("ksBinnedSplit: equals exact KS when every value gets its own bin") {
    // values 0..9, 10 bins over the ref range [0,9]: wait — bin width
    // 0.9 puts 0,9 alone but some values share; use values 0..4 with
    // ref range [0,4] and 5 bins — each integer lands in its own bin
    // except the max (clamped), still its own. Binned == exact.
    val rng = new scala.util.Random(31)
    val rows = (1 to 400).map(i =>
      ("g", (rng.nextInt(5)).toDouble, i % 2 == 0))
    val df = rows.toDF("grp", "v", "is_ref")
    val binned = Drift.ksBinnedSplit(df, col("is_ref"), "grp", "v", nBins = 5)
      .select("d_num", "ks").as[(Long, Double)].head()
    val exact = Drift.ksStatisticSplit(df, col("is_ref"), "grp", "v")
      .select("d_num", "ks").as[(Long, Double)].head()
    assert(binned == exact)
  }

  test("ksBinnedSplit never exceeds the exact KS (coarse bins lower-bound D)") {
    val rng = new scala.util.Random(37)
    val rows = (1 to 600).map(i =>
      ("g", rng.nextDouble() * 50 + (if (i % 2 == 0) 0 else 10), i % 2 == 0))
    val df = rows.toDF("grp", "v", "is_ref")
    val binned = Drift.ksBinnedSplit(df, col("is_ref"), "grp", "v", nBins = 8)
      .select("ks").as[Double].head()
    val exact = Drift.ksStatisticSplit(df, col("is_ref"), "grp", "v")
      .select("ks").as[Double].head()
    assert(binned <= exact && binned > 0.0, s"binned $binned exact $exact")
  }

  test("psi: zero for identical sides, large for a shifted distribution") {
    val ref = (1 to 200).map(v => ("g", (v % 10).toDouble)).toDF("grp", "v")
    val zero = Drift.psi(ref, ref, "grp", "v", nBins = 5)
      .select("psi").as[Double].collect()
    assert(zero.forall(_ == 0.0))

    // current mass entirely in the top of the reference range
    val cur = (1 to 200).map(v => ("g", 9.0)).toDF("grp", "v")
    val shifted = Drift.psi(ref, cur, "grp", "v", nBins = 5)
      .select("psi").as[Double].head()
    assert(shifted > 0.25, s"psi=$shifted should flag a full shift")
  }

  test("psi: counts are exact, outliers clamp into edge bins, mass conserved") {
    val ref = (0 until 100).map(v => ("g", v.toDouble)).toDF("grp", "v")
    // current has values far outside the reference range on both sides
    val cur = (Seq(-500.0, -400.0, 600.0) ++
      (0 until 97).map(_.toDouble)).map(("g", _)).toDF("grp", "v")
    val rows = Drift.psi(ref, cur, "grp", "v", nBins = 4)
      .orderBy("bin")
      .as[(String, Int, Long, Long, Long, Long, Double)].collect().toSeq
    assert(rows.map(_._2) == Seq(0, 1, 2, 3))
    assert(rows.map(_._3).sum == 100L)
    assert(rows.map(_._4).sum == 100L)
    // bins are 25-wide over [0,99]; clamped: bin0 = 25 ref vs 25+2 cur
    assert(rows(0)._3 == 25L && rows(0)._4 == 27L)
    assert(rows(3)._3 == 25L && rows(3)._4 == 23L) // 22 in-range + 600.0
  }

  test("EXTREME outliers clamp to the correct edge (no int-cast wrap)") {
    // regression: (v - mn) * nBins / (mx - mn) for v = 1e300 saturates
    // the double->long floor; a long->int cast FIRST used to wrap it
    // negative and drop the high outlier into bin 0
    val ref = (0 until 100).map(v => ("g", v.toDouble)).toDF("grp", "v")
    val cur = Seq(("g", 1e300), ("g", -1e300), ("g", 50.0)).toDF("grp", "v")
    val rows = Drift.psi(ref, cur, "grp", "v", nBins = 4)
      .orderBy("bin")
      .as[(String, Int, Long, Long, Long, Long, Double)].collect().toSeq
    val curByBin = rows.map(r => r._2 -> r._4).toMap
    assert(curByBin(0) == 1L) // -1e300 -> bottom bin
    assert(curByBin(3) == 1L) // +1e300 -> TOP bin, not wrapped to 0
    assert(curByBin(2) == 1L) // 50.0 in its real bin
    // and the streaming scalar twin agrees bin-for-bin
    assert(Drift.refBinScalar(1e300, 0.0, 99.0, 4) == 3)
    assert(Drift.refBinScalar(-1e300, 0.0, 99.0, 4) == 0)
    assert(Drift.refBinScalar(50.0, 0.0, 99.0, 4) == 2)
  }

  test("psiSplit ignores NULL side flags (no phantom both-zero bins)") {
    // rows with a null flag belong to neither snapshot; before the
    // fix they witnessed their bin with zero counts on both sides and
    // added spurious smoothed PSI mass when n_ref != n_cur
    // reference witnesses only the edge bins (values 0 and 7 of 4
    // bins), current only the top — the null row's value 3.5 lands in
    // bin 2, which NO side member witnesses, so before the fix it
    // materialized a phantom (c_ref=0, c_cur=0) row
    val clean = (Seq.fill(4)(("g", 0.0, true)) ++ Seq.fill(4)(("g", 7.0, true)) ++
      Seq.fill(3)(("g", 9.0, false))).toDF("grp", "v", "is_ref")
    val withNull = (Seq.fill(4)(("g", 0.0, java.lang.Boolean.TRUE)) ++
      Seq.fill(4)(("g", 7.0, java.lang.Boolean.TRUE)) ++
      Seq.fill(3)(("g", 9.0, java.lang.Boolean.FALSE)) ++
      Seq(("g", 3.5, null.asInstanceOf[java.lang.Boolean])))
      .toDF("grp", "v", "is_ref")
    def run(df: org.apache.spark.sql.DataFrame) =
      Drift.psiSplit(df, col("is_ref"), "grp", "v", nBins = 4)
        .orderBy("bin")
        .as[(String, Int, Long, Long, Long, Long, Double)].collect().toSeq
    assert(run(withNull) == run(clean))
  }

  test("chiSquareSplit matches a hand-computed statistic") {
    // ref: a=4 b=4; cur: a=2 b=6 — K=2, alpha=0.5
    val rows = Seq.fill(4)(("g", "a", true)) ++ Seq.fill(4)(("g", "b", true)) ++
      Seq.fill(2)(("g", "a", false)) ++ Seq.fill(6)(("g", "b", false))
    val out = Drift.chiSquareSplit(rows.toDF("grp", "cat", "r"),
        col("r"), "grp", "cat", alpha = 0.5)
      .orderBy("category")
      .as[(String, String, Long, Long, Long, Long, Double, Double, Long)]
      .collect().toSeq
    val ea = 8.0 * 4.5 / 9.0   // n_cur*(c_ref+.5)/(n_ref+.5*K) = 4
    val eb = 8.0 * 4.5 / 9.0
    val chi2 = math.rint(((2 - ea) * (2 - ea) / ea
      + (6 - eb) * (6 - eb) / eb) * 1e6) / 1e6
    assert(out == Seq(
      ("g", "a", 4L, 2L, 8L, 8L, 4.0, chi2, 1L),
      ("g", "b", 4L, 6L, 8L, 8L, 4.0, chi2, 1L)))
    assert(chi2 == 2.0)
  }

  test("chiSquareSplit: a cur-only category contributes a finite large term") {
    val rows = Seq.fill(6)(("g", "a", true)) ++
      Seq.fill(3)(("g", "a", false)) ++ Seq.fill(3)(("g", "z", false))
    val out = Drift.chiSquareSplit(rows.toDF("grp", "cat", "r"),
        col("r"), "grp", "cat")
      .orderBy("category")
      .as[(String, String, Long, Long, Long, Long, Double, Double, Long)]
      .collect().toSeq
    val z = out.find(_._2 == "z").get
    assert(z._3 == 0L && z._4 == 3L)
    assert(z._8 > 10.0 && !z._8.isInfinite && !z._8.isNaN)
    intercept[IllegalArgumentException] {
      Drift.chiSquareSplit(rows.toDF("grp", "cat", "r"), col("r"),
        "grp", "cat", alpha = 0.0)
    }
  }

  test("chiSquareSplit: an empty current side raises the named error") {
    val rows = Seq(("g", "a", true), ("g", "b", true))
    val e = intercept[Exception] {
      Drift.chiSquareSplit(rows.toDF("grp", "cat", "r"),
        col("r"), "grp", "cat").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("empty current side")))
  }

  test("chiSquareSplit: identical distributions give a near-zero statistic") {
    val rows = (0 until 40).map(i =>
      ("g", s"c${i % 4}", i < 20))   // each category: 5 ref, 5 cur
    val out = Drift.chiSquareSplit(rows.toDF("grp", "cat", "r"),
        col("r"), "grp", "cat")
      .select("chi2").distinct()
      .as[Double].collect().toSeq
    assert(out.size == 1 && out.head < 0.01, s"chi2=$out")
  }
}
