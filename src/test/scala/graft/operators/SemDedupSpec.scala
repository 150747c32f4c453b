package graft.operators

import graft.SparkSuite

class SemDedupSpec extends SparkSuite {
  import spark.implicits._

  private def verdicts(df: org.apache.spark.sql.DataFrame,
      nlist: Int, tau: Double): Map[Long, (Long, Long, Long)] =
    SemDedup.semDedup(df, "vec_id", "embedding", nlist, tau)
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("cell"), r.getAs[Long]("n_sim_lower"),
          r.getAs[Long]("kept"))))
      .toMap

  test("within-cell near-dups drop, distant cell-mates survive") {
    // seeds (ids 1, 2) define the two cells; 3 and 4 are near-copies
    // of seed 1, 5 a near-copy of seed 2, 6 in cell 1 but dissimilar
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Seq(1.0f, 0.01f, 0.0f, 0.0f)),
      (4L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
      (5L, Seq(0.0f, 1.0f, 0.01f, 0.0f)),
      (6L, Seq(0.0f, 0.5f, 0.8f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = verdicts(vecs, nlist = 2, tau = 0.9)
    assert(out.size == 6, "one verdict row per input vector")
    assert(out(1L) == ((0L, 0L, 1L)))
    assert(out(2L) == ((1L, 0L, 1L)))
    assert(out(3L)._1 == 0L && out(3L)._3 == 0L)
    assert(out(4L)._1 == 0L && out(4L)._3 == 0L)
    assert(out(5L)._1 == 1L && out(5L)._3 == 0L)
    assert(out(6L) == ((1L, 0L, 1L)), "dissimilar cell-mate is kept")
  }

  test("dominance rule: a~b and b~c drops BOTH b and c even when a!~c") {
    // tau = 0.9; b at 25 deg of a (cos .906), c at 50 deg (cos to a
    // .64, to b .906). The order-free dominance rule drops c because
    // SOME lower id (b) is similar — a sequential greedy walk would
    // keep c after discarding b. This pins the documented semantics.
    val rad = math.Pi / 180.0
    def at(deg: Double) = Seq(math.cos(deg * rad).toFloat,
      math.sin(deg * rad).toFloat, 0.0f, 0.0f)
    val vecs = Seq((1L, at(0)), (2L, at(25)), (3L, at(50)))
      .toDF("vec_id", "embedding")
    val out = verdicts(vecs, nlist = 1, tau = 0.9)
    assert(out(1L)._3 == 1L)
    assert(out(2L)._3 == 0L && out(2L)._2 == 1L, "b similar to a only")
    assert(out(3L)._3 == 0L && out(3L)._2 == 1L, "c similar to b only")
  }

  test("max_cos_lower is null for kept vectors, populated for dropped") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val rows = SemDedup.semDedup(vecs, "vec_id", "embedding", 1, 0.9)
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(rows(1L).isNullAt(rows(1L).fieldIndex("max_cos_lower")))
    assert(rows(2L).getAs[Double]("max_cos_lower") == 1.0)
  }

  test("incremental: exact copy matches, novel vector is new, one row per incoming") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Seq(0.95f, 0.05f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val incoming = Seq(
      (100L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),   // exact copy of 1
      (101L, Seq(0.0f, 0.0f, 1.0f, 0.0f)))   // orthogonal to everything
      .toDF("vec_id", "embedding")
    val out = SemDedup.semDedupIncremental(corpus, incoming,
        "vec_id", "embedding", nlist = 2, tau = 0.9)
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(out.size == 2, "one verdict row per INCOMING vector only")
    assert(out(100L).getAs[String]("status") == "near_dup")
    // both 1 and 3 clear tau=0.9 against the copy; match_id is the smallest
    assert(out(100L).getAs[Long]("match_id") == 1L)
    assert(out(100L).getAs[Long]("n_sim") == 2L)
    assert(out(100L).getAs[Double]("max_cos") == 1.0)
    assert(out(101L).getAs[String]("status") == "new")
    assert(out(101L).isNullAt(out(101L).fieldIndex("match_id")))
    assert(out(101L).getAs[Long]("n_sim") == 0L)
  }

  test("verdict is invariant under input partitioning") {
    val base = (1L to 40L).map(i =>
      (i, Seq((i % 7).toFloat, (i % 5).toFloat, (i % 3).toFloat, 1.0f)))
    val a = verdicts(base.toDF("vec_id", "embedding"), 4, 0.95)
    val b = verdicts(base.toDF("vec_id", "embedding").repartition(13), 4, 0.95)
    assert(a == b)
  }
}
