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

  test("multi-probe buckets: 2^nFlip distinct probes including the base bucket") {
    import org.apache.spark.sql.functions._
    val planes = Similarity.hyperplanes(8, 4)
    val probed = Similarity.withNorm(vecs, "vec_id", "embedding")
      .select(col("vec_id"),
        Similarity.lshBucket(col("v"), planes).as("base"),
        Similarity.lshProbeBuckets(col("v"), planes, 3).as("probes"))
      .collect()
    for (r <- probed) {
      val base = r.getAs[Long]("base")
      val probes = r.getSeq[Long](r.fieldIndex("probes"))
      assert(probes.length == 8)
      assert(probes.distinct.length == 8, s"probes collide: $probes")
      assert(probes.contains(base), s"base $base missing from $probes")
      // every probe differs from base only in the 3 flipped plane bits
      assert(probes.forall(p => java.lang.Long.bitCount(p ^ base) <= 3))
    }
  }

  test("multi-probe recall dominates single-probe on a spread of random vectors") {
    val rng = new scala.util.Random(5)
    val many = (0L until 120L).map(i =>
      (i, Seq.fill(16)(rng.nextGaussian().toFloat), 0))
      .toDF("vec_id", "embedding", "label")
    val q = many.filter("vec_id < 8")
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r =>
        (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val brute = hits(Similarity.bruteTopK(many, q, "vec_id", "embedding", 5))
    val single = hits(Similarity.lshTopK(many, q, "vec_id", "embedding", 5, 8, 16))
    val multi = hits(Similarity.lshTopKMultiProbe(many, q, "vec_id",
      "embedding", 5, 8, 16, nFlip = 3))
    val rSingle = (brute & single).size.toDouble / brute.size
    val rMulti = (brute & multi).size.toDouble / brute.size
    // guaranteed: single-probe candidates are a subset of multi-probe
    // candidates (the base bucket is always probed), and a true-top-k
    // hit can only be displaced by other true-top-k hits — so recall
    // dominates row-wise. The absolute level is data-dependent:
    // near-random vectors differ from their true neighbors in many
    // sign bits (the measured trade is recorded in SURVEY §12).
    assert(rMulti >= rSingle, s"multi-probe recall $rMulti < single $rSingle")
    assert(rMulti >= 0.1, s"multi-probe recall collapsed: $rMulti")
  }

  test("multi-table: finds identical vectors, dedupes cross-table candidates") {
    val q = vecs.filter("vec_id = 1")
    val rows = Similarity.lshTopKMultiTable(vecs, q, "vec_id", "embedding",
        3, 6, 4, nTables = 3)
      .collect()
    // identical vector co-buckets in EVERY table yet appears once
    assert(rows.count(_.getAs[Long]("neighbor_id") == 2L) == 1)
    // ranks are dense from 1 with no duplicate neighbors
    val rnks = rows.map(_.getAs[Long]("rnk")).sorted.toSeq
    assert(rnks == (1L to rows.length).toSeq)
    assert(rows.map(_.getAs[Long]("neighbor_id")).distinct.length == rows.length)
  }

  test("multi-table recall dominates its own single-table cut") {
    val rng = new scala.util.Random(7)
    val many = (0L until 120L).map(i =>
      (i, Seq.fill(16)(rng.nextGaussian().toFloat), 0))
      .toDF("vec_id", "embedding", "label")
    val q = many.filter("vec_id < 8")
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r =>
        (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val brute = hits(Similarity.bruteTopK(many, q, "vec_id", "embedding", 5))
    val one = hits(Similarity.lshTopKMultiTable(many, q, "vec_id",
      "embedding", 5, 6, 16, nTables = 1))
    val three = hits(Similarity.lshTopKMultiTable(many, q, "vec_id",
      "embedding", 5, 6, 16, nTables = 3))
    val rOne = (brute & one).size.toDouble / brute.size
    val rThree = (brute & three).size.toDouble / brute.size
    // table 0's candidates are a subset of the 3-table union, so
    // recall dominates row-wise (same displacement argument as
    // multi-probe above); the absolute level is data-dependent.
    assert(rThree >= rOne, s"3-table recall $rThree < 1-table $rOne")
    assert(rThree >= 0.1, s"multi-table recall collapsed: $rThree")
  }

  test("lshRecallArms slices are row-identical to the per-arm " +
      "lshTopK / lshTopKMultiProbe calls (r17 fusion guard)") {
    // a richer corpus: 40 deterministic 4-dim vectors, queries = 4
    val rich = (1L to 40L).map { i =>
      (i, Seq(math.sin(i * 1.0).toFloat, math.cos(i * 2.0).toFloat,
        math.sin(i * 3.0).toFloat, math.cos(i * 5.0).toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
    val qs = rich.filter("vec_id <= 4")
    val k = 5
    val fused = Similarity.lshRecallArms(rich, qs, "vec_id", "embedding",
      k, 8, 4, nFlip = 3).collect()
    def pairs(rows: Array[org.apache.spark.sql.Row], flag: String) = rows
      .filter(r => !r.isNullAt(r.fieldIndex(flag)))
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    val lshRef = Similarity.lshTopK(rich, qs, "vec_id", "embedding", k, 8, 4)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"))).toSet
    val mpRef = Similarity.lshTopKMultiProbe(rich, qs, "vec_id", "embedding",
        k, 8, 4, nFlip = 3)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"))).toSet
    assert(pairs(fused, "__l") == lshRef, "single-probe slice diverged")
    assert(pairs(fused, "__m") == mpRef, "multi-probe slice diverged")
  }

  test("annRecallCandidates slices are row-identical to the brute/" +
      "lshTopK/lshTopKMultiProbe/lshTopKMultiTable/IvfIndex.search " +
      "towers (r18 full-gate fusion guard)") {
    val rich = (1L to 40L).map { i =>
      (i, Seq(math.sin(i * 1.0).toFloat, math.cos(i * 2.0).toFloat,
        math.sin(i * 3.0).toFloat, math.cos(i * 5.0).toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
    val qs = rich.filter("vec_id <= 4")
    val k = 5
    val ivf = IvfIndex.buildDeterministic(rich, "vec_id", "embedding",
      nlist = 6)
    val fused = Similarity.annRecallCandidates(qs, "vec_id", "embedding",
      k, nPlanes = 8, dim = 4, nFlip = 3, mtPlanes = 6, mtTables = 3,
      ivf = ivf, nprobe = 2).collect()
    def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"))).toSet
    def slice(flag: String): Set[(Long, Long)] = fused
      .filter(r => !r.isNullAt(r.fieldIndex(flag)))
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    val brute = pairsOf(Similarity.bruteTopK(rich, qs, "vec_id", "embedding", k))
    // the fused frame IS the brute top-k pair set (one row per pair)
    assert(fused.map(r => (r.getAs[Long]("query_id"),
      r.getAs[Long]("neighbor_id"))).toSet == brute, "truth slice diverged")
    assert(fused.length == brute.size, "duplicate truth rows")
    // each arm flag marks exactly (brute top-k) ∩ (arm top-k) — the
    // pair set the r17 left-join gate produced
    val lshRef = pairsOf(Similarity.lshTopK(rich, qs, "vec_id", "embedding", k, 8, 4))
    val mpRef = pairsOf(Similarity.lshTopKMultiProbe(rich, qs, "vec_id",
      "embedding", k, 8, 4, nFlip = 3))
    val mtRef = pairsOf(Similarity.lshTopKMultiTable(rich, qs, "vec_id",
      "embedding", k, 6, 4, nTables = 3))
    val ivfRef = pairsOf(IvfIndex.search(ivf, qs, "vec_id", "embedding",
      k, nprobe = 2))
    assert(slice("__l") == (brute & lshRef), "single-probe slice diverged")
    assert(slice("__m") == (brute & mpRef), "multi-probe slice diverged")
    assert(slice("__t") == (brute & mtRef), "multi-table slice diverged")
    assert(slice("__i") == (brute & ivfRef), "ivf slice diverged")
  }
}
