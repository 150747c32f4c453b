package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** M5 -> D4 composition (VERDICT r9 #4): dHash fingerprints through
  * the banded Hamming machinery. Pins three properties:
  *
  *   1. EXACTNESS — with nBands > maxHamming the banded pair set
  *      equals a brute-force all-pairs scan (pigeonhole);
  *   2. the degenerate-bucket cap drops wide buckets, nothing else;
  *   3. SCALE — on a realistic corpus (spread fingerprints + planted
  *      near-dups) candidate volume is ≪ all-pairs, the property that
  *      makes the operator runnable on 10^9 images where brute force
  *      is 10^18 comparisons.
  */
class ImageNearDupSpec extends SparkSuite {
  import spark.implicits._

  /** Deterministic 60-bit spread hash (splitmix-style finalizer). */
  private def spread(i: Long): Long = {
    var z = i + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) & ((1L << 60) - 1)
  }

  private def brutePairs(hs: Map[Long, Long], maxHamming: Int): Set[(Long, Long, Long)] = {
    val ids = hs.keys.toSeq.sorted
    (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      d = java.lang.Long.bitCount(hs(ids(i)) ^ hs(ids(j))).toLong
      if d <= maxHamming
    } yield (ids(i), ids(j), d)).toSet
  }

  test("banded pairs == brute force when nBands > maxHamming (pigeonhole)") {
    // 80 spread hashes + planted 1-3 bit perturbations of the first 20
    val hs: Map[Long, Long] =
      ((0L until 80L).map(i => i -> spread(i)) ++
        (0L until 20L).map(i => (1000L + i) ->
          (spread(i) ^ (1L << (i % 60).toInt) ^
            (if (i % 3 == 0L) 1L << ((i * 7 + 13) % 60).toInt else 0L)))).toMap
    val df = hs.toSeq.toDF("doc_id", "h")
    for (t <- Seq(1, 2, 3); bands <- Seq(t + 1, 6).distinct if 60 % bands == 0) {
      val got = Dedup.bandedHammingPairs(df, "doc_id", "h", 60, bands, t)
        .collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("hamming")))
        .toSet
      assert(got == brutePairs(hs, t), s"mismatch at t=$t bands=$bands")
    }
  }

  test("maxBucket drops only the degenerate bucket's pairs") {
    // 10 identical hashes (one flooded bucket in every band) + one
    // clean near-dup pair
    val flood = (0L until 10L).map(i => i -> 0x123456789abcdeL)
    val clean = Seq(100L -> spread(100L), 101L -> (spread(100L) ^ 2L))
    val df = (flood ++ clean).toDF("doc_id", "h")
    val capped = Dedup.bandedHammingPairs(df, "doc_id", "h", 60, 6, 3, maxBucket = 5)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(capped == Set((100L, 101L)))
    val uncapped = Dedup.bandedHammingPairs(df, "doc_id", "h", 60, 6, 3)
      .count()
    assert(uncapped == 45L + 1L) // 10-choose-2 flood pairs + the clean one
  }

  test("imageNearDup finds identical-ramp payloads at Hamming 0 from REAL decode") {
    // synthesis params are (id%7, id%256, id%12)-periodic: ids equal
    // mod lcm = 5376 decode to identical rasters, hence dHash 0 apart
    val ids = Seq(3L, 3L + 5376L, 7L).toDF("doc_id")
    val out = Multimodal.imageNearDup(
        Multimodal.synthesizeCorpus(ids, "doc_id"), "doc_id", "media",
        maxHamming = 0, nBands = 3)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("hamming")))
    assert(out.toSeq == Seq((3L, 3L + 5376L, 0L)))
  }

  test("scale probe: candidate volume ≪ all-pairs on spread fingerprints") {
    val n = 3000L
    // corpus: spread base hashes + a planted near-dup per 10th doc
    val hs = (0L until n).map(i => i -> spread(i)) ++
      (0L until n by 10L).map(i => (n + i) -> (spread(i) ^ (1L << (i % 60).toInt)))
    val df = hs.toDF("doc_id", "h")
    val width = 10
    val bandStructs = (0 until 6).map(j =>
      struct(lit(j).as("band"),
        shiftright(col("h"), width * j).bitwiseAND(lit(1023L)).as("bv")))
    val candidates = df
      .select(explode(array(bandStructs: _*)).as("b"))
      .groupBy(col("b.band"), col("b.bv")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * (col("c") - 1))).head.getLong(0) / 2
    val total = hs.size.toLong
    val allPairs = total * (total - 1) / 2
    // planted pairs are ~300; spurious 10-bit collisions add noise but
    // the candidate set must stay orders of magnitude under all-pairs
    assert(candidates < allPairs / 50,
      s"banding generated $candidates candidates vs $allPairs all-pairs")
    // and the operator still finds every planted pair exactly
    val found = Dedup.bandedHammingPairs(df, "doc_id", "h", 60, 6, 1)
      .filter(col("doc_a") < lit(n) && col("doc_b") >= lit(n))
      .count()
    assert(found == (0L until n by 10L).size.toLong)
  }
}
