package graft.operators

import graft.SparkSuite

class RankFusionSpec extends SparkSuite {
  import spark.implicits._

  private def micro(rank: Long, c: Long = 60L): Long =
    math.round(1000000.0 / (c + rank))

  test("fuses two arms by exact micro-reciprocal sum") {
    // arm A: x > y > z; arm B: y > x (z unseen by B)
    val a = Seq((1L, "x", 1L), (1L, "y", 2L), (1L, "z", 3L))
      .toDF("q", "item", "rank")
    val b = Seq((1L, "y", 1L), (1L, "x", 2L)).toDF("q", "item", "rank")
    val got = RankFusion.rrf(Seq(a, b), "q", "item", "rank", k = 3)
      .as[(Long, Long, String, Long, Long)].collect().toSeq.sortBy(_._2)
    val wantX = micro(1) + micro(2)
    val wantY = micro(2) + micro(1)
    val wantZ = micro(3)
    // x and y tie exactly (symmetric ranks): item id breaks the tie
    assert(got == Seq(
      (1L, 1L, "x", wantX, 2L),
      (1L, 2L, "y", wantY, 2L),
      (1L, 3L, "z", wantZ, 1L)))
    assert(wantX == wantY)
  }

  test("a single arm reproduces its own ordering") {
    val a = (1L to 7L).map(r => (9L, s"i$r", r)).toDF("q", "item", "rank")
    val got = RankFusion.rrf(Seq(a), "q", "item", "rank", k = 5)
      .as[(Long, Long, String, Long, Long)].collect().toSeq.sortBy(_._2)
    assert(got.map(_._3) == (1L to 5L).map(r => s"i$r"))
    assert(got.map(_._4) == (1L to 5L).map(micro(_)))
    assert(got.forall(_._5 == 1L))
  }

  test("an item ranked by more arms outranks a single high rank") {
    // item 'both' at rank 3 in two arms beats 'solo' at rank 2 in one:
    // 2/(60+3) > 1/(60+2)
    val a = Seq((1L, "both", 3L), (1L, "solo", 2L)).toDF("q", "item", "rank")
    val b = Seq((1L, "both", 3L)).toDF("q", "item", "rank")
    val got = RankFusion.rrf(Seq(a, b), "q", "item", "rank", k = 2)
      .as[(Long, Long, String, Long, Long)].collect().toSeq.sortBy(_._2)
    assert(got.map(_._3) == Seq("both", "solo"))
  }

  test("queries fuse independently") {
    val a = Seq((1L, "p", 1L), (2L, "q", 1L)).toDF("q", "item", "rank")
    val b = Seq((2L, "q", 1L)).toDF("q", "item", "rank")
    val got = RankFusion.rrf(Seq(a, b), "q", "item", "rank", k = 5)
      .as[(Long, Long, String, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 1L, "p", micro(1), 1L),
      (2L, 1L, "q", 2 * micro(1), 2L)))
  }

  test("rejects empty arm lists and bad k") {
    intercept[IllegalArgumentException] { RankFusion.rrf(Nil, "q", "i", "r", 5) }
    intercept[IllegalArgumentException] {
      RankFusion.rrf(Seq(Seq((1L, "a", 1L)).toDF("q", "item", "rank")),
        "q", "item", "rank", 0)
    }
  }
}
