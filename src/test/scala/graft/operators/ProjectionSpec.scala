package graft.operators

import graft.SparkSuite

class ProjectionSpec extends SparkSuite {
  import spark.implicits._

  // 4-dim toy vectors; planes come from the deterministic generator
  private val dim = 4

  test("jlProject: components are the scaled plane dots, bit-exact") {
    val v = Seq(0.5f, -1.0f, 2.0f, 0.0f)
    val df = Seq((1L, v)).toDF("vec_id", "embedding")
    val k = 3
    val planes = Similarity.hyperplanes(k, dim, Projection.Salt)
    // mirror the operator's arithmetic exactly: sequential-fold dot,
    // then MULTIPLY by the precomputed reciprocal (x/s differs by 1 ulp)
    val scale = 1.0 / math.sqrt(k.toDouble)
    val expected = planes.map(p =>
      p.zip(v.map(_.toDouble)).foldLeft(0.0) {
        case (acc, (a, b)) => acc + a * b
      } * scale)
    val got = Projection.jlProject(df, "vec_id", "embedding", k, dim)
      .collect().head.getSeq[Double](1)
    assert(got.size == k)
    // same fold order (sequential) and exact scale -> bit equality
    got.zip(expected).foreach { case (g, e) => assert(g == e, s"$g != $e") }
  }

  test("jlDistortion: identical vectors project to cosine 1 with zero error") {
    val v = Seq(1.0f, 2.0f, -1.0f, 0.5f)
    val df = Seq((1L, v), (2L, v)).toDF("vec_id", "embedding")
    val r = Projection.jlDistortion(df, "vec_id", "embedding", 3, dim)
      .collect().head
    assert(r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L)
    assert(r.getAs[Double]("cos_orig") == 1.0)
    assert(r.getAs[Double]("cos_proj") == 1.0)
    assert(r.getAs[Double]("abs_err") == 0.0)
  }

  test("jlDistortion: mean distortion shrinks as k grows (8 -> 64 on 4-dim data)") {
    val vecs = (1L to 60L).map(i => (i,
      Seq((i % 7).toFloat - 3f, (i % 5).toFloat, (i % 3).toFloat - 1f, 1.0f)))
      .toDF("vec_id", "embedding")
    def meanErr(k: Int): Double = {
      val rows = Projection.jlDistortion(vecs, "vec_id", "embedding", k, dim)
        .collect().map(_.getAs[Double]("abs_err"))
      rows.sum / rows.length
    }
    val e8 = meanErr(8)
    val e64 = meanErr(64)
    assert(e64 < e8, s"expected distortion to shrink: k=8 -> $e8, k=64 -> $e64")
  }

  test("mrlDistortion: hand-checked prefix error and the k = dim zero row") {
    // pair (1,0,0,0) x (0.6,0.8,0,0): full cosine 0.6; prefix k=1
    // cosine 1.0 -> err 0.4 exactly; k=4 (full dim) -> err 0
    val df = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.6f, 0.8f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Projection.mrlDistortion(df, "vec_id", "embedding", Seq(1, 4))
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 400000L, 400000L, 400000.0),
      (4L, 1L, 0L, 0L, 0.0)))
  }

  test("mrlDistortion: error sums are exact integers under any partitioning") {
    // first component strictly positive so no prefix is the zero
    // vector (which raises, by contract)
    val vecs = (1L to 40L).map(i => (i,
      Seq((i % 7).toFloat + 1f, (i % 5).toFloat, (i % 3).toFloat - 1f, 1.0f)))
    def run(parts: Int) =
      Projection.mrlDistortion(
          vecs.toDF("vec_id", "embedding").repartition(parts),
          "vec_id", "embedding", Seq(2, 3))
        .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(run(1) == run(7))
  }

  test("jlDistortion: only consecutive-id pairs appear, ordered") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (5L, Seq(0.0f, 0.0f, 1.0f, 0.0f)), // gap: (2,5) is NOT a pair
      (6L, Seq(0.0f, 0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val pairs = Projection.jlDistortion(vecs, "vec_id", "embedding", 4, dim)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSeq
    assert(pairs == Seq((1L, 2L), (5L, 6L)))
  }
}
