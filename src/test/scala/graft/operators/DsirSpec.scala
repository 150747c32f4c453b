package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class DsirSpec extends SparkSuite {
  import spark.implicits._

  // two sharply different vocabularies: targets talk fruit, raw noise
  // talks animals; doc 5 mixes, doc 6 is pure noise
  private val docs = Seq(
    (1L, "apple banana apple banana", "tgt"),
    (2L, "banana apple banana apple", "tgt"),
    (3L, "apple banana cherry apple", "tgt"),
    (4L, "dog cat dog cat dog", "web"),
    (5L, "apple banana dog cat", "web"),
    (6L, "cat dog cat dog cat", "web"),
    (7L, "apple cherry banana apple", "web"),
    (8L, "dog dog cat cat dog", "web"))
    .toDF("doc_id", "text", "source")

  private def run(permille: Int = 250) =
    Dsir.select(docs, "doc_id", "text", col("source") === "tgt",
      nBuckets = 64, selectPermille = permille)

  test("target-vocabulary documents outscore raw-noise documents") {
    val s = run().collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_micro"))
      .toMap
    // doc 7 shares the target vocabulary without being in the target
    // slice — the whole point of DSIR is that it scores high anyway
    assert(s(7L) > s(5L), "fruit-only web doc beats the mixed doc")
    assert(s(5L) > s(4L) && s(5L) > s(6L) && s(5L) > s(8L),
      "mixed doc beats pure-noise docs")
  }

  test("n_grams counts unigrams + bigrams (2k-1 for k tokens)") {
    val n = run().collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_grams"))
      .toMap
    assert(n(1L) == 7L, "4 tokens -> 4 unigrams + 3 bigrams")
    assert(n(4L) == 9L, "5 tokens -> 5 unigrams + 4 bigrams")
  }

  test("selection takes exactly floor(n * permille / 1000) by rank") {
    val rows = run(250).collect()
    assert(rows.count(_.getAs[Long]("selected") == 1L) == 2,
      "8 docs at 250 permille -> 2 selected")
    val selectedRanks = rows.filter(_.getAs[Long]("selected") == 1L)
      .map(_.getAs[Long]("sel_rank")).sorted.toSeq
    assert(selectedRanks == Seq(1L, 2L))
    assert(rows.count(_.getAs[Long]("selected") == 1L) ==
      rows.filter(r => r.getAs[Long]("sel_rank") <= 2).length)
  }

  test("scores are exact integers: invariant under repartitioning") {
    val a = run().collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_micro"),
        r.getAs[Long]("sel_rank"))).sortBy(_._1).toSeq
    val b = Dsir.select(docs.repartition(7), "doc_id", "text",
        col("source") === "tgt", nBuckets = 64, selectPermille = 250)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_micro"),
        r.getAs[Long]("sel_rank"))).sortBy(_._1).toSeq
    assert(a == b)
  }
}
