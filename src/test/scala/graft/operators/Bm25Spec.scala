package graft.operators

import graft.SparkSuite

class Bm25Spec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark merge spark spark"),
    (2L, "merge sort join"),
    (3L, "spark"),
    (4L, "nothing relevant here at all whatsoever today"),
    (5L, "merge merge merge merge merge merge merge merge")
  ).toDF("doc_id", "text")

  /** Driver-side reference of the same float program. */
  private def reference(terms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75): Seq[(Long, Long, Int, Double)] = {
    val toks = Map(
      1L -> Seq("spark", "merge", "spark", "spark"),
      2L -> Seq("merge", "sort", "join"),
      3L -> Seq("spark"),
      4L -> Seq("nothing", "relevant", "here", "at", "all", "whatsoever",
        "today"),
      5L -> Seq.fill(8)("merge"))
    val n = toks.size.toLong
    val total = toks.values.map(_.size.toLong).sum
    val avgdl = total.toDouble / n
    def round6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dfs = terms.map(t => t -> toks.values.count(_.contains(t)).toLong)
      .toMap
    toks.toSeq.map { case (id, tk) =>
      val dl = tk.size.toLong
      val scores = terms.map { t =>
        val tf = tk.count(_ == t).toLong
        if (tf == 0) 0.0
        else {
          val idf = round6(math.log(1.0 + (n.toDouble - dfs(t) + 0.5)
            / (dfs(t) + 0.5)))
          round6(idf * (tf * (k1 + 1))
            / (tf + k1 * (1.0 - b + b * dl / avgdl)))
        }
      }
      val hits = terms.count(t => tk.contains(t))
      (id, dl, hits, round6(scores.sum))
    }.filter(_._3 > 0)
      .sortBy { case (id, _, _, s) => (-s, id) }
  }

  test("scores, hit counts, and ranking match the driver-side float program") {
    val got = TextAnalysis.bm25(docs, "doc_id", "text",
        Seq("merge", "spark"), topK = 10)
      .orderBy("rnk")
      .select($"doc_id", $"dl", $"n_terms_hit", $"bm25")
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(got == reference(Seq("merge", "spark")))
  }

  test("zero-df terms contribute nothing; docs without any term drop") {
    val got = TextAnalysis.bm25(docs, "doc_id", "text",
        Seq("merge", "zzznotfound"), topK = 10)
      .select($"doc_id", $"bm25").as[(Long, Double)].collect().toMap
    val onlyMerge = TextAnalysis.bm25(docs, "doc_id", "text",
        Seq("merge"), topK = 10)
      .select($"doc_id", $"bm25").as[(Long, Double)].collect().toMap
    assert(got == onlyMerge)
    assert(!got.contains(4L) && !got.contains(3L))
  }

  test("topK truncates after the (score DESC, doc_id) rank") {
    val got = TextAnalysis.bm25(docs, "doc_id", "text",
        Seq("merge", "spark"), topK = 2)
      .select($"rnk", $"doc_id").as[(Int, Long)].collect().toSeq.sorted
    val full = reference(Seq("merge", "spark")).take(2).map(_._1)
    assert(got.map(_._2) == full)
    assert(got.map(_._1) == Seq(1, 2))
  }

  test("unsorted or duplicate term lists are rejected") {
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25(docs, "doc_id", "text", Seq("spark", "merge"))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25(docs, "doc_id", "text", Seq("a'b"))
    }
  }
}
