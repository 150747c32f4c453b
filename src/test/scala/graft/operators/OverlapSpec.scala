package graft.operators

import graft.SparkSuite

class OverlapSpec extends SparkSuite {
  import spark.implicits._

  test("pairwise Jaccard over shingle sets matches a driver-side brute force") {
    val docs = Seq(
      (1L, "a", "the quick brown fox jumps over the lazy dog"),
      (2L, "a", "pack my box with five dozen liquor jugs"),
      (3L, "b", "the quick brown fox naps beside the lazy dog"),
      (4L, "b", "completely different content with no sharing at all"),
      (5L, "c", "pack my box with five dozen liquor jugs exactly"),
      (6L, "d", "zz yy xx ww vv uu")                  // disjoint source
    ).toDF("doc_id", "source", "text")

    // brute force: distinct word-3-gram STRING sets per source (the
    // hashed sets are a bijection of these on a collision-free corpus)
    val sets: Map[String, Set[String]] = docs
      .as[(Long, String, String)].collect()
      .groupBy(_._2)
      .map { case (s, rows) =>
        s -> rows.flatMap(_._3.trim.split("\\s+").toSeq.sliding(3)
          .filter(_.size == 3).map(_.mkString(" "))).toSet
      }
    val expected = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size if inter > 0
    } yield (a, b) -> (inter.toLong, sets(a).size.toLong,
      sets(b).size.toLong,
      math.rint(inter.toDouble / (sets(a).size + sets(b).size - inter)
        * 1e6) / 1e6)).toMap

    val got = Overlap.sourceOverlap(docs, "source", "text", 3)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map { case (a, b, c, na, nb, j) => (a, b) -> (c, na, nb, j) }.toMap
    assert(got == expected)
    assert(!got.keySet.exists { case (a, b) => a == "d" || b == "d" },
      "disjoint source must emit no rows")
  }

  test("within-source duplicate shingles count once (distinct per source)") {
    val docs = Seq(
      (1L, "a", "x y z"), (2L, "a", "x y z"),   // same shingle twice in a
      (3L, "b", "x y z")
    ).toDF("doc_id", "source", "text")
    val got = Overlap.sourceOverlap(docs, "source", "text", 3)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("a", "b", 1L, 1L, 1L, 1.0)))
  }
}
