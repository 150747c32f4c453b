package graft.operators

import graft.SparkSuite

class PcaSpec extends SparkSuite {
  import spark.implicits._

  test("recovers the dominant axis of an anisotropic cloud") {
    // points along (1, 2)/sqrt(5) with small orthogonal jitter
    val axis = Vector(1.0 / math.sqrt(5), 2.0 / math.sqrt(5))
    val ortho = Vector(-2.0 / math.sqrt(5), 1.0 / math.sqrt(5))
    val rows = (-20 to 20).map { t =>
      val j = (t % 5) * 0.01
      (t.toLong + 100L,
        Seq(t * axis(0) + j * ortho(0) + 3.0,
          t * axis(1) + j * ortho(1) - 1.0))
    }
    val df = rows.toDF("vec_id", "embedding")
    val (mean, pc, lambda) = Pca.topComponent(df, "embedding")
    assert(math.abs(mean(0) - 3.0) < 1e-4 &&
      math.abs(mean(1) + 1.0) < 1e-4)
    // sign canon: largest-|coord| entry positive -> pc ~ +axis (the
    // correlated jitter tilts the true eigenvector by ~1e-3, so the
    // check is alignment, not equality)
    assert(pc(0) * axis(0) + pc(1) * axis(1) > 0.99999, s"pc=$pc")
    assert(math.abs(pc.map(x => x * x).sum - 1.0) < 1e-9)
    // eigenvalue = variance along the axis: mean of t^2 for t=-20..20
    val expectedVar = (-20 to 20).map(t => t * t).sum / 41.0
    assert(math.abs(lambda - expectedVar) < 0.1, s"lambda=$lambda")
  }

  test("projections are centered and match a driver-side dot product") {
    val rows = Seq(
      (1L, Seq(1.0, 0.0, 0.0)),
      (2L, Seq(3.0, 0.0, 0.0)),
      (3L, Seq(5.0, 0.0, 0.0)))
    val df = rows.toDF("vec_id", "embedding")
    val (mean, pc, _) = Pca.topComponent(df, "embedding")
    val got = Pca.project(df, "vec_id", "embedding", mean, pc)
      .as[(Long, Double)].collect().toMap
    val expected = rows.map { case (id, v) =>
      id -> math.rint(v.zip(pc).map { case (x, p) => x * p }.sum * 1e6 -
        math.rint(mean.zip(pc).map { case (m, p) => m * p }.sum * 1e6) +
        0.0) / 1e6
    }.toMap
    // centered: scores sum to ~0; axis is x -> scores are -2, 0, +2
    assert(math.abs(got.values.sum) < 1e-6)
    assert(math.abs(math.abs(got(1L)) - 2.0) < 1e-6 &&
      math.abs(got(2L)) < 1e-6)
    assert(expected.forall { case (k, v) => math.abs(got(k) - v) < 2e-6 })
  }

  test("bit-identical under repartitioning (decimal-exact moments)") {
    val rows = (0 until 200).map { i =>
      (i.toLong, Seq(math.sin(i * 0.7) * 3, math.cos(i * 1.3) * 2,
        math.sin(i * 2.1), math.cos(i * 0.3) * 0.5))
    }
    val df = rows.toDF("vec_id", "embedding")
    val a = Pca.topComponent(df.repartition(1), "embedding")
    val b = Pca.topComponent(df.repartition(13), "embedding")
    assert(a == b, "moments must be order-independent")
    val pa = Pca.project(df.repartition(3), "vec_id", "embedding",
      a._1, a._2).as[(Long, Double)].collect().toMap
    val pb = Pca.project(df.repartition(7), "vec_id", "embedding",
      b._1, b._2).as[(Long, Double)].collect().toMap
    assert(pa == pb)
  }

  test("ragged vector lengths are rejected, not silently mis-averaged") {
    val df = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(1.0, 2.0, 3.0)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Pca.topComponent(df, "embedding")
    }
    assert(e.getMessage.contains("differing lengths"))
  }

  test("embeddings table: component is unit-norm, eigenvalue positive") {
    val df = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings")
    val (mean, pc, lambda) = Pca.topComponent(df, "embedding", iters = 20)
    assert(pc.size == mean.size)
    assert(math.abs(pc.map(x => x * x).sum - 1.0) < 1e-9)
    assert(lambda > 0)
  }

  test("the matrix aggregate reproduces the explode path to the last bit") {
    val df = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings")
    val slow = Pca.topComponent(df, "embedding", iters = 20)
    val fast = Pca.topComponentFast(df, "embedding", dim = 64, iters = 20)
    assert(fast == slow)
    // and under adversarial partitioning (many partial merges)
    val fast13 = Pca.topComponentFast(df.repartition(13), "embedding",
      dim = 64, iters = 20)
    assert(fast13 == slow)
  }

  test("grouped moments equal per-group runs of the ungrouped aggregate") {
    val df = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings")
    val grouped = Pca.momentsViaAggBy(df, "embedding", 64, "label")
      .as[(Int, Int, Int, Double, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3, r._4, r._5, r._6))
        .toSet).toMap
    val labels = df.select("label").distinct()
      .as[Int].collect().toSeq
    labels.foreach { l =>
      val single = Pca.momentsViaAgg(df.filter($"label" === l),
          "embedding", 64)
        .as[(Int, Int, Double, Double, Long)].collect().toSet
      assert(grouped(l) == single, s"label $l")
    }
  }

  test("matrix aggregate raises on a dim mismatch and on oversized values") {
    val ragged = Seq((1L, Seq(1.0, 2.0))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Pca.topComponentFast(ragged, "embedding", dim = 3)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("!= dim")))
    val huge = Seq((1L, Seq(1e12, 0.0))).toDF("vec_id", "embedding")
    val e2 = intercept[Exception] {
      Pca.topComponentFast(huge, "embedding", dim = 2)
    }
    assert(msgs(e2).exists(_.contains("too large")))
  }
}
