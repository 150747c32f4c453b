package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class PqIndexSpec extends SparkSuite {
  import spark.implicits._

  private val m = 4
  private val ksub = 8
  private val dim = 16
  private val dsub = dim / m

  private def corpus(n: Int, seed: Int) = {
    val rng = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong,
      Array.fill(dim)(rng.nextDouble() * 2 - 1)))
      .toDF("vec_id", "embedding")
  }

  test("codebook vectors encode to their own codes; codes are m small ints") {
    val df = corpus(60, 5)
    val (cb, codes) = PqIndex.buildDeterministic(df, "vec_id", "embedding",
      m, ksub)
    assert(cb.words.length == m && cb.words.forall(_.length == ksub))
    val rows = codes.orderBy("vec_id")
      .as[(Long, Seq[Int])].collect()
    assert(rows.length == 60)
    assert(rows.forall { case (_, cs) =>
      cs.length == m && cs.forall(c => c >= 0 && c < ksub) })
    // the ksub sample vectors reconstruct exactly -> their own index
    rows.take(ksub).foreach { case (id, cs) =>
      assert(cs.forall(_ == id.toInt), s"vec $id encoded $cs") }
  }

  test("ADC estimate equals the exact distance to the reconstruction") {
    val df = corpus(50, 9)
    val (cb, codes) = PqIndex.buildDeterministic(df, "vec_id", "embedding",
      m, ksub)
    val got = PqIndex.searchAdc(cb, codes, df.filter(col("vec_id") < 3),
        "vec_id", "embedding", 5)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._3) -> r._4).toMap

    val vecs = df.as[(Long, Seq[Double])].collect().toMap
    val codeMap = codes.as[(Long, Seq[Int])].collect().toMap
    got.foreach { case ((qid, nid), d2est) =>
      val q = vecs(qid)
      // the same ascending-subspace fold, in plain Scala
      val expected = (0 until m).foldLeft(0.0) { (acc, s) =>
        val sub = q.slice(s * dsub, (s + 1) * dsub)
        val w = cb.words(s)(codeMap(nid)(s))
        val qn = sub.foldLeft(0.0)((a, x) => a + x * x)
        val dot = sub.zip(w).foldLeft(0.0)((a, p) => a + p._1 * p._2)
        acc + (qn - 2.0 * dot + cb.norms(s)(codeMap(nid)(s)))
      }
      val rounded = BigDecimal(expected)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(d2est == rounded, s"($qid,$nid): $d2est != $rounded")
    }
  }

  test("IVF-PQ equals plain ADC restricted to the probed cells") {
    val df = corpus(80, 21)
    val (cb, codes) = PqIndex.buildDeterministic(df, "vec_id", "embedding",
      m, ksub)
    val ivf = IvfIndex.buildDeterministic(df, "vec_id", "embedding", nlist = 6)
    val queries = df.filter(col("vec_id") < 3)

    val got = PqIndex.searchIvfAdc(ivf, cb, codes, queries,
        "vec_id", "embedding", k = 4, nprobe = 2)
      .orderBy("query_id", "rnk")
      .as[(Long, Long, Long, Double)].collect().toSeq

    // independent expectation: ADC over ONLY the vectors in each
    // query's 2 nearest cells, via the full-scan kernel + a cell filter
    val cellOf = ivf.cells.select("vec_id", "cell")
      .as[(Long, Int)].collect().toMap
    val expected = queries.select("vec_id").as[Long].collect().sorted.toSeq
      .flatMap { qid =>
        val probed = IvfIndex.probeCells(col("v"), col("nrm2"),
          ivf.centroids, 2)
        val cells = Similarity.withNorm(df.filter(col("vec_id") === qid),
            "vec_id", "embedding")
          .select(probed.as("cs")).as[Seq[Int]].head().toSet
        val cand = df.filter(col("vec_id").isInCollection(
          cellOf.filter(c => cells(c._2)).keys.toSeq))
        PqIndex.searchAdc(cb,
            codes.join(cand.select("vec_id"), "vec_id"),
            df.filter(col("vec_id") === qid), "vec_id", "embedding", 4)
          .orderBy("rnk").as[(Long, Long, Long, Double)].collect().toSeq
      }
    assert(got == expected)
    // full ADC with nprobe = nlist degenerates to the plain scan
    val all = PqIndex.searchIvfAdc(ivf, cb, codes, queries,
        "vec_id", "embedding", k = 4, nprobe = 6)
      .orderBy("query_id", "rnk").collect().toSeq
    val plain = PqIndex.searchAdc(cb, codes, queries,
        "vec_id", "embedding", 4)
      .orderBy("query_id", "rnk").collect().toSeq
    assert(all == plain)
  }

  test("fused searchIvfAdc (codes derived in-row from ivf.cells) is " +
      "row-identical to the stored-codes overload (r18 fusion guard)") {
    val df = corpus(80, 21)
    val (cb, codes) = PqIndex.buildDeterministic(df, "vec_id", "embedding",
      m, ksub)
    val ivf = IvfIndex.buildDeterministic(df, "vec_id", "embedding", nlist = 6)
    val queries = df.filter(col("vec_id") < 3)
    val stored = PqIndex.searchIvfAdc(ivf, cb, codes, queries,
        "vec_id", "embedding", k = 4, nprobe = 2)
      .orderBy("query_id", "rnk").collect().toSeq
    val fused = PqIndex.searchIvfAdc(ivf, cb, queries,
        "vec_id", "embedding", k = 4, nprobe = 2)
      .orderBy("query_id", "rnk").collect().toSeq
    assert(fused == stored)
  }

  test("Lloyd refinement never worsens reconstruction error") {
    val df = corpus(120, 33)
    val (cb0, _) = PqIndex.buildDeterministic(df, "vec_id", "embedding",
      m, ksub)
    val mse0 = PqIndex.reconstructionMse(df, "vec_id", "embedding", cb0)
    val (cb3, codes3) = PqIndex.refineKMeans(df, "vec_id", "embedding",
      cb0, iters = 3)
    val mse3 = PqIndex.reconstructionMse(df, "vec_id", "embedding", cb3)
    assert(mse3 <= mse0, s"refinement regressed: $mse3 > $mse0")
    assert(mse3 < mse0 * 0.9,
      s"3 Lloyd rounds should cut MSE materially: $mse3 vs $mse0")
    // refined codes stay well-formed
    val rows = codes3.as[(Long, Seq[Int])].collect()
    assert(rows.length == 120)
    assert(rows.forall(_._2.forall(c => c >= 0 && c < ksub)))
  }

  test("a vector sharing its codes with the query's nearest ranks first") {
    // construct: 20 base vectors; vector 30 = exact copy of vector 12
    // shifted out of the sample range, so it shares vector 12's codes
    val base = corpus(20, 3).as[(Long, Seq[Double])].collect()
    val clone = (30L, base(12)._2)
    val df = (base :+ clone).toSeq.toDF("vec_id", "embedding")
    val (cb, codes) = PqIndex.buildDeterministic(df, "vec_id", "embedding",
      m, ksub)
    val top = PqIndex.searchAdc(cb, codes, df.filter(col("vec_id") === 12),
        "vec_id", "embedding", 1)
      .select("neighbor_id").as[Long].head()
    assert(top == 30L, s"the exact clone should be the ADC top-1, got $top")
  }
}
