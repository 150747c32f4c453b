package graft.operators

import graft.SparkSuite

class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  test("textStats computes exact ratios") {
    val docs = Seq((1L, "the cat sat on a mat!")).toDF("doc_id", "text")
    val r = TextAnalysis.textStats(docs, "doc_id", "text").collect().head
    assert(r.getAs[Long]("n_tokens") == 6L)
    assert(r.getAs[Long]("n_distinct") == 6L)
    // tokens: the(3) cat(3) sat(3) on(2) a(1) mat!(4) -> 16/6
    assert(r.getAs[Double]("avg_token_len") == 2.6667)
    assert(r.getAs[Double]("stop_ratio") == 0.3333) // the, a
    assert(r.getAs[Double]("punct_ratio") == math.rint(1.0 / 21.0 * 1e4) / 1e4)
    assert(r.getAs[Double]("upper_ratio") == 0.0)
  }

  test("langId prediction is the argmax bucket with deterministic ties") {
    val docs = Seq((1L, "alpha beta gamma delta", "en")).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.langId(docs, "doc_id", "text", "lang").collect()
    assert(out.length == 1)
    val r = out.head
    assert(TextAnalysis.Langs.contains(r.getAs[String]("pred_lang")))
    assert(r.getAs[Double]("confidence") > 0.0)
  }

  test("tokenCounts splits BPE-ish subwords") {
    val docs = Seq(("s1", "ab12cd ef!")).toDF("source", "text")
    val r = TextAnalysis.tokenCounts(docs, "source", "text").collect().head
    assert(r.getAs[Long]("ws_tokens") == 2L)
    // ab / 12 / cd / ef / ! -> 5
    assert(r.getAs[Long]("bpe_tokens") == 5L)
  }

  test("fingerprint is order-sensitive (anagram docs differ)") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma beta alpha"),
      (3L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprint(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fp")).toMap
    assert(fps(1L) == fps(3L))
    assert(fps(1L) != fps(2L))
  }
}
