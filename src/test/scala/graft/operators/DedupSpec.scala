package graft.operators

import graft.SparkSuite

class DedupSpec extends SparkSuite {
  import spark.implicits._

  // doc 1 == doc 2 (exact dup); doc 3 is a near-dup of 1 (one word
  // changed); doc 4 is unrelated.
  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"),
    (3L, "the quick brown fox leaps over the lazy dog again and again"),
    (4L, "completely different content with no overlap whatsoever here now"))
    .toDF("doc_id", "text")

  test("operators yield empty results on an empty corpus") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      docs.schema)
    assert(Dedup.exact(empty, "doc_id", "text").count() == 0)
    assert(Dedup.ngramJaccard(empty, "doc_id", "text", 3, 1, 2).count() == 0)
    assert(Dedup.minhashLsh(empty, "doc_id", "text", 3, 1, 2).count() == 0)
  }

  test("exact dedup groups identical texts") {
    val out = Dedup.exact(docs, "doc_id", "text").collect()
    assert(out.length == 3)
    val dup = out.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("ngram Jaccard finds exact and near dups, skips unrelated") {
    val pairs = Dedup.ngramJaccard(docs, "doc_id", "text", 3, 1, 2)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Double]("jaccard"))
      .toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) < 1.0)
    assert(!pairs.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("minhash LSH finds the exact dup pair (identical signatures)") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text", 3, 1, 2)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(pairs.contains((1L, 2L)))
  }

  test("simhash: identical docs at Hamming 0") {
    val pairs = Dedup.simhashNearDup(docs, "doc_id", "text", 3)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Long]("hamming"))
      .toMap
    assert(pairs((1L, 2L)) == 0L)
  }

  test("xxhash fast path finds the same pair set as the md5 oracle path") {
    val md5Pairs = Dedup.ngramJaccard(docs, "doc_id", "text", 3, 1, 2)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val xxPairs = Dedup.ngramJaccard(docs, "doc_id", "text", 3, 1, 2,
        tokenHash = c => graft.functions.Hashing.xx60(c) % 1073741824L)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(xxPairs == md5Pairs && md5Pairs.nonEmpty)
  }

  test("minhash signature is k stable columns") {
    val sig = Dedup.minhashSignatures(
      Dedup.shingleSets(docs, "doc_id", "text", 3))
    assert(sig.columns.toSeq ==
      "doc_id" +: (0 until Dedup.MinhashK).map(i => s"mh_$i"))
    // identical docs -> identical signatures
    val rows = sig.filter("doc_id IN (1, 2)").drop("doc_id").collect()
    assert(rows(0) == rows(1))
  }

  test("cluster resolution labels transitive components with the min id") {
    // chain 1-2, 2-5 (transitive: 5 never paired with 1 directly),
    // isolated pair 7-9, singleton 8
    val ids = Seq(1L, 2L, 5L, 7L, 8L, 9L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 5L), (7L, 9L)).toDF("doc_a", "doc_b")
    val out = Dedup.clusters(ids, "doc_id", pairs)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
      .toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 7L -> 7L, 8L -> 8L, 9L -> 7L))
  }

  test("cluster resolution converges on a long chain within maxIters") {
    val n = 12
    val ids = (1L to n).toDF("doc_id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = Dedup.clusters(ids, "doc_id", pairs, maxIters = 15)
      .collect().map(r => r.getAs[Long]("cluster_id")).distinct
    assert(out.toSeq == Seq(1L))
  }
}
