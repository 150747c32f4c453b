package graft.operators

import graft.SparkSuite

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  // v1 == v2 (cosine 1), v3 orthogonal to v1, v4 = -v1.
  private val vecs = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 0),
    (2L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 0),
    (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f), 0),
    (4L, Seq(-1.0f, 0.0f, 0.0f, 0.0f), 1))
    .toDF("vec_id", "embedding", "label")

  test("cosinePairs: identical vectors at cos 1, blocked by label") {
    val out = Similarity.cosinePairs(vecs, "vec_id", "embedding", "label", 0.9)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("id_a") == 1L)
    assert(out.head.getAs[Long]("id_b") == 2L)
    assert(out.head.getAs[Double]("cos") == 1.0)
  }

  test("bruteTopK ranks by cosine desc with id tie-break") {
    val q = vecs.filter("vec_id = 1")
    val out = Similarity.bruteTopK(vecs, q, "vec_id", "embedding", 3)
      .collect()
      .map(r => (r.getAs[Long]("rnk"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cos")))
    assert(out.toSeq == Seq((1, 2L, 1.0), (2, 3L, 0.0), (3, 4L, -1.0)))
  }

  test("lshTopK finds the identical vector (same bucket by construction)") {
    val q = vecs.filter("vec_id = 1")
    val out = Similarity.lshTopK(vecs, q, "vec_id", "embedding", 3, 8, 4)
      .collect()
      .map(r => r.getAs[Long]("neighbor_id"))
    assert(out.contains(2L))
  }

  test("cosinePairsLsh finds identical vectors without a label column") {
    val out = Similarity.cosinePairsLsh(vecs, "vec_id", "embedding",
        tau = 0.9, nPlanes = 8, dim = 4)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("id_a") == 1L)
    assert(out.head.getAs[Long]("id_b") == 2L)
    assert(out.head.getAs[Double]("cos") == 1.0)
  }

  test("hyperplanes are deterministic") {
    val a = Similarity.hyperplanes(4, 8)
    val b = Similarity.hyperplanes(4, 8)
    assert(a.flatten.toSeq == b.flatten.toSeq)
    assert(a.flatten.forall(x => x >= -1.0 && x <= 1.0))
  }
}
