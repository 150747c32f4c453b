package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

class HardNegativesSpec extends SparkSuite {
  import spark.implicits._

  private def mineRows(corpus: org.apache.spark.sql.DataFrame,
      queryIds: Seq[Long], k: Int, nlist: Int, nprobe: Int) =
    HardNegatives.mine(corpus,
        corpus.filter(col("vec_id").isin(queryIds: _*)),
        "vec_id", "embedding", "label", k, nlist, nprobe)
      .select(col("query_id"), col("rnk"), col("neighbor_id"),
        col("neighbor_label"), col("cos"))
      .as[(Long, Long, Long, Int, Double)]
      .collect().sortBy(r => (r._1, r._2)).toSeq

  test("same-label neighbors never appear, even when they are closest") {
    val corpus = Seq(
      (0L, Seq(1.0, 0.0), 0),
      (1L, Seq(0.9, 0.1), 0), // closest to 0 overall — same label
      (2L, Seq(0.8, 0.2), 1),
      (3L, Seq(0.0, 1.0), 1),
      (4L, Seq(0.6, 0.4), 0), // same label — excluded
      (5L, Seq(-1.0, 0.1), 1))
      .toDF("vec_id", "embedding", "label")
    val got = mineRows(corpus, Seq(0L), k = 3, nlist = 2, nprobe = 2)
    assert(got.map(r => (r._3, r._4)) == Seq((2L, 1), (3L, 1), (5L, 1)))
    // hand-checked cosines: 0.8/sqrt(0.68), 0, -1/sqrt(1.01)
    assert(got.map(_._5) == Seq(0.970143, 0.0, -0.995037))
  }

  test("recall vs brute truth: 1.0 at nprobe = nlist, non-decreasing below") {
    val corpus = spark.range(40).select(col("id").as("vec_id"),
      expr("transform(sequence(1, 4), j -> " +
        "CAST((abs(xxhash64(concat(id, '_', j))) % 1000 - 500) AS DOUBLE) / 100.0)")
        .as("embedding"),
      (col("id") % 3).cast("int").as("label"))
      .localCheckpoint(eager = true)
    val q = corpus.filter(col("vec_id") < 4)
    val truth = HardNegatives.brute(corpus, q, "vec_id", "embedding", "label", 4)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    def recalls(np: Int): Map[Long, Double] =
      HardNegatives.mine(corpus, q, "vec_id", "embedding", "label",
          k = 4, nlist = 5, nprobe = np)
        .select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().groupBy(_._1)
        .map { case (qid, v) =>
          qid -> v.map(_._2).count(truth(qid)).toDouble / truth(qid).size }
    val byNp = Seq(1, 2, 3, 5).map(np => np -> recalls(np))
    assert(byNp.last._2.values.forall(_ == 1.0))
    byNp.sliding(2).foreach { case Seq((_, lo), (_, hi)) =>
      lo.keys.foreach(qid => assert(hi(qid) >= lo(qid)))
    }
  }

  test("probing every cell equals the brute-force different-label top-k") {
    // deterministic pseudo-random 4-dim corpus, 3 labels
    val corpus = spark.range(40).select(col("id").as("vec_id"),
      expr("transform(sequence(1, 4), j -> " +
        "CAST((abs(xxhash64(concat(id, '_', j))) % 1000 - 500) AS DOUBLE) / 100.0)")
        .as("embedding"),
      (col("id") % 3).cast("int").as("label"))
      .localCheckpoint(eager = true)
    val qids = Seq(0L, 7L, 13L)
    val got = mineRows(corpus, qids, k = 4, nlist = 5, nprobe = 5)

    // brute force: every different-label pair, same (cos desc, id) rank
    val n = Similarity.withNorm(corpus, "vec_id", "embedding", Seq("label"))
    val cos = Similarity.cosine(
      Similarity.dotD(col("a.v"), col("b.v")), col("a.nrm2"), col("b.nrm2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val brute = n.as("a").filter(col("a.vec_id").isin(qids: _*))
      .join(n.as("b"), col("a.label") =!= col("b.label"))
      .select(col("a.vec_id").as("query_id"),
        col("b.vec_id").as("neighbor_id"),
        col("b.label").as("neighbor_label"), cos.as("cos"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 4)
      .select(col("query_id"), col("rnk"), col("neighbor_id"),
        col("neighbor_label"), round(col("cos"), 6).as("cos"))
      .as[(Long, Long, Long, Int, Double)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == brute)
  }
}
