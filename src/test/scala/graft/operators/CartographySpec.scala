package graft.operators

import graft.SparkSuite

class CartographySpec extends SparkSuite {
  import spark.implicits._

  // group "tight": vectors clustered around (1, 0); group "spread":
  // orthogonal directions (centroid pulls toward their mean, members
  // sit at a wide angle from it)
  private val vecs = Seq(
    (1L, "tight", Seq(1.0f, 0.0f)),
    (2L, "tight", Seq(0.9f, 0.1f)),
    (3L, "tight", Seq(1.1f, -0.1f)),
    (4L, "spread", Seq(1.0f, 0.0f)),
    (5L, "spread", Seq(0.0f, 1.0f)))
    .toDF("vec_id", "grp_in", "embedding")

  test("compact groups score higher centroid cosine than spread groups") {
    val out = Cartography.centroidStats(vecs, "vec_id", "embedding", "grp_in")
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(out.keySet == Set("tight", "spread"))
    val tight = out("tight")
    val spread = out("spread")
    assert(tight.getAs[Long]("n_vecs") == 3L && tight.getAs[Long]("dim") == 2L)
    assert(tight.getAs[Double]("avg_cos") > 0.99)
    assert(spread.getAs[Double]("avg_cos") < 0.75)
    // spread centroid (0.5, 0.5): members at 45 degrees -> cos ~0.7071
    assert(math.abs(spread.getAs[Double]("min_cos") - 0.7071) < 0.001)
  }

  test("stats are bit-identical under repartitioning (decimal-exact centroid)") {
    val base = Cartography.centroidStats(vecs, "vec_id", "embedding", "grp_in")
      .orderBy("grp").collect().toSeq
    val shuffled = Cartography.centroidStats(
        vecs.repartition(7), "vec_id", "embedding", "grp_in")
      .orderBy("grp").collect().toSeq
    assert(base == shuffled)
  }
}
