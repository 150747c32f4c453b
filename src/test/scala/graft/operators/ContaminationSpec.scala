package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class ContaminationSpec extends SparkSuite {
  import spark.implicits._

  // 10-token docs; doc 100 copies train doc 1 verbatim, doc 101 shares
  // nothing, doc 102 shares its first half.
  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "train"),
    (2L, "one two three four five six seven eight nine ten", "train"),
    (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "test"),
    (101L, "red orange yellow green blue indigo violet black white gray", "test"),
    (102L, "alpha beta gamma delta epsilon foo bar baz qux quux", "test"))
    .toDF("doc_id", "text", "split")

  test("overlap fraction is exact per test doc") {
    val out = Contamination.ngramOverlap(docs, "doc_id", "text", "split", n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(100L).getAs[Double]("overlap_frac") == 1.0)
    assert(out(100L).getAs[Boolean]("contaminated"))
    assert(out(101L).getAs[Double]("overlap_frac") == 0.0)
    assert(!out(101L).getAs[Boolean]("contaminated"))
    // doc 102: 8 3-grams, first 3 (alpha..epsilon) are in train
    assert(out(102L).getAs[Long]("n_shingles") == 8L)
    assert(out(102L).getAs[Long]("n_hit") == 3L)
    assert(out(102L).getAs[Boolean]("contaminated")) // 3/8 >= 1/5
  }

  test("train docs are not scored and val docs are ignored") {
    val withVal = docs.union(
      Seq((200L, "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "val")).toDF("doc_id", "text", "split"))
    val ids = Contamination.ngramOverlap(withVal, "doc_id", "text", "split", 3)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(100L, 101L, 102L))
  }

  test("ngramOverlapBy: hand-computed per-suite blame (rollup of the " +
      "per-doc audit, suite = the test doc's own facet)") {
    // suiteA: docs 100 (10 toks -> 8 3-grams, all hit), 102 (8 grams,
    // 3 hit), and 103 (2 toks — too short to shingle, must be COUNTED
    // as skipped, not silently vanish from the audit coverage);
    // suiteB: doc 101 (8 grams, 0 hit). Train docs' suite must not
    // matter (tagged suiteB to prove it).
    val faceted = docs.union(Seq((103L, "tiny doc", "test"))
        .toDF("doc_id", "text", "split"))
      .withColumn("suite",
        when(col("doc_id").isin(100L, 102L, 103L), "suiteA")
          .otherwise("suiteB"))
    val out = Contamination.ngramOverlapBy(faceted, "doc_id", "text",
        "split", "suite", n = 3)
      .collect().map(r => r.getAs[String]("suite") -> r).toMap
    assert(out.keySet == Set("suiteA", "suiteB"))
    val a = out("suiteA")
    assert(a.getAs[Long]("n_docs") == 2L)
    assert(a.getAs[Long]("n_docs_skipped") == 1L) // doc 103: < n tokens
    assert(a.getAs[Long]("n_contaminated") == 2L) // 8/8 and 3/8, both >= 1/5
    assert(a.getAs[Long]("n_shingles") == 16L)
    assert(a.getAs[Long]("n_hit") == 11L)
    assert(a.getAs[Double]("overlap_frac") == 0.6875)
    val b = out("suiteB")
    assert(b.getAs[Long]("n_docs") == 1L) // train docs not audited
    assert(b.getAs[Long]("n_docs_skipped") == 0L)
    assert(b.getAs[Long]("n_contaminated") == 0L)
    assert(b.getAs[Long]("n_shingles") == 8L)
    assert(b.getAs[Long]("n_hit") == 0L)
    assert(b.getAs[Double]("overlap_frac") == 0.0)
  }

  test("threshold is integer-exact at the boundary") {
    // exactly 1/5 of shingles hit -> contaminated at thr 1/5
    val d = Seq(
      (1L, "a b c", "train"),
      (10L, "a b c x1 x2 x3 x4", "test")) // 5 3-grams, 1 hit
      .toDF("doc_id", "text", "split")
    val r = Contamination.ngramOverlap(d, "doc_id", "text", "split", 3)
      .collect().head
    assert(r.getAs[Long]("n_shingles") == 5L && r.getAs[Long]("n_hit") == 1L)
    assert(r.getAs[Boolean]("contaminated"))
  }
}
