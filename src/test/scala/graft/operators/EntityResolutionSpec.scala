package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class EntityResolutionSpec extends SparkSuite {
  import spark.implicits._

  private def df(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")

  test("fuzzyJoin finds cross-table near-matches and only those") {
    val left = df(Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "pack my box with five dozen liquor jugs",
      3L -> "completely unrelated text about spark plans"))
    val right = df(Seq(
      11L -> "the quick brown fox jumps over the lazy dog tonight",
      12L -> "pack my box with five dozen liquor jugs",
      13L -> "nothing shared with anything here at all"))
    val out = EntityResolution
      .fuzzyJoin(left, right, "doc_id", "text", 3, 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set(1L -> 11L, 2L -> 12L))
  }

  test("capped path equals uncapped when no pair overlaps only in hot shingles") {
    val docs = (0L until 40L).map(i =>
      i -> s"common prefix tokens here alpha beta doc$i gamma delta epsilon zeta")
    val left = df(docs.filter(_._1 % 2 == 0))
    val right = df(docs.filter(_._1 % 3 == 0)
      .map { case (i, t) => (i + 100L) -> (t + " extra") })
    // tau = 1/2: the 6 boilerplate shingles every cross pair shares
    // give jaccard 6/13 < 1/2, so hot-only pairs are below threshold —
    // the documented regime where the cap is lossless
    def pairs(maxDf: Long) = EntityResolution
      .fuzzyJoin(left, right, "doc_id", "text", 3, 1, 2, maxDf = maxDf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    // cap above every true df: identical pair set AND identical counts
    assert(pairs(0) == pairs(1000))
    // production-style cap: the shared common-prefix shingles go hot,
    // but every true match also shares rare doc-specific context, and
    // the hot add-back restores the EXACT shared counts
    assert(pairs(0) == pairs(30))
    // the surviving pairs are exactly the perturbed copies
    assert(pairs(30).map(p => (p._1, p._2)) ==
      docs.map(_._1).filter(i => i % 2 == 0 && i % 3 == 0)
        .map(i => i -> (i + 100L)).toSet)
  }

  test("bestMatch keeps only mutual rank-1 pairs") {
    val pairs = Seq(
      // left 1 prefers right 11 (0.9) over 12 (0.5); right 11 prefers left 1
      (1L, 11L, 9L, 10L, 10L, 0.9),
      (1L, 12L, 5L, 10L, 10L, 0.5),
      // left 2's best is 11, but 11's best is left 1 -> 2 matches nothing
      (2L, 11L, 7L, 10L, 10L, 0.7),
      // isolated mutual pair survives
      (3L, 13L, 4L, 10L, 10L, 0.4))
      .toDF("left_id", "right_id", "shared", "n_l", "n_r", "jaccard")
    val out = EntityResolution.bestMatch(pairs)
      .select("left_id", "right_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set(1L -> 11L, 3L -> 13L))
  }

  test("bestMatch tie-breaks deterministically by id") {
    val pairs = Seq(
      (1L, 11L, 5L, 10L, 10L, 0.5),
      (1L, 12L, 5L, 10L, 10L, 0.5))
      .toDF("left_id", "right_id", "shared", "n_l", "n_r", "jaccard")
    val out = EntityResolution.bestMatch(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set(1L -> 11L))
  }

  test("empty and degenerate inputs") {
    val empty = df(Seq.empty)
    val some = df(Seq(1L -> "a few tokens beyond the gram floor"))
    assert(EntityResolution
      .fuzzyJoin(empty, some, "doc_id", "text", 3, 1, 2).count() == 0)
    assert(EntityResolution
      .fuzzyJoin(some, empty, "doc_id", "text", 3, 1, 2).count() == 0)
    // docs below the token floor generate no shingles on either side
    val short = df(Seq(2L -> "too short"))
    assert(EntityResolution
      .fuzzyJoin(short, short, "doc_id", "text", 3, 1, 2).count() == 0)
  }
}
