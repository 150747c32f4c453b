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

  test("scrubSemantic: eval-similar train vectors flag, clean ones don't, eval never pairs itself") {
    val train = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),   // copy of eval 100
      (2L, Seq(0.99f, 0.1f, 0.0f, 0.0f)),  // near eval 100
      (3L, Seq(0.0f, 0.0f, 1.0f, 0.0f)))   // orthogonal to all eval
      .toDF("vec_id", "embedding")
    val evalc = Seq(
      (100L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (101L, Seq(0.0f, 1.0f, 0.0f, 0.0f)), // near eval 100? no — but near NOTHING in train
      (102L, Seq(0.0f, 0.98f, 0.05f, 0.0f))) // near eval 101, NOT near train
      .toDF("vec_id", "embedding")
    val out = SemDedup.scrubSemantic(train, evalc, "vec_id", "embedding",
        nlist = 2, tau = 0.9, nprobe = 2)
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(out.size == 3, "one verdict row per TRAIN vector only")
    assert(out(1L).getAs[String]("status") == "contaminated")
    assert(out(1L).getAs[Long]("match_id") == 100L)
    assert(out(1L).getAs[Double]("max_cos") == 1.0)
    assert(out(2L).getAs[String]("status") == "contaminated")
    assert(out(2L).getAs[Long]("match_id") == 100L)
    // eval 101~102 are mutually similar but that must NOT surface:
    // only train x eval pairs exist, so doc 3 stays clean
    assert(out(3L).getAs[String]("status") == "clean")
    assert(out(3L).isNullAt(out(3L).fieldIndex("match_id")))
    assert(out(3L).getAs[Long]("n_sim") == 0L)
  }

  test("scrubSemantic: nprobe=2 catches a boundary vector its single cell would miss") {
    // eval seeds at e1/e2 define two cells; the contaminating eval
    // vector 102 sits in cell 0 (nearer e1), while the train probe 1
    // is nearer e2's centroid — single-cell routing would pair it
    // only with cell-1 members and miss 102.
    val evalc = Seq(
      (100L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (101L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (102L, Seq(0.8f, 0.6f, 0.0f, 0.0f))) // cell 0 (cos .8 to e1 > .6 to e2)
      .toDF("vec_id", "embedding")
    val train = Seq(
      (1L, Seq(0.65f, 0.76f, 0.0f, 0.0f))) // nearest cell 1, cos to 102=.976
      .toDF("vec_id", "embedding")
    val two = SemDedup.scrubSemantic(train, evalc, "vec_id", "embedding",
        nlist = 2, tau = 0.95, nprobe = 2)
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(two(1L).getAs[String]("status") == "contaminated")
    assert(two(1L).getAs[Long]("match_id") == 102L)
    val one = SemDedup.scrubSemantic(train, evalc, "vec_id", "embedding",
        nlist = 2, tau = 0.95, nprobe = 1)
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(one(1L).getAs[String]("status") == "clean",
      "single-cell routing misses the cross-boundary eval match")
  }

  test("verdict is invariant under input partitioning") {
    val base = (1L to 40L).map(i =>
      (i, Seq((i % 7).toFloat, (i % 5).toFloat, (i % 3).toFloat, 1.0f)))
    val a = verdicts(base.toDF("vec_id", "embedding"), 4, 0.95)
    val b = verdicts(base.toDF("vec_id", "embedding").repartition(13), 4, 0.95)
    assert(a == b)
  }
}
