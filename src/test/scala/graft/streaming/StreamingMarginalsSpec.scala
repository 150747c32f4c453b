package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.QualityCascade

class StreamingMarginalsSpec extends SparkSuite {
  import spark.implicits._

  private val rules = QualityCascade.documentRules(col("text"),
    minTokens = 5L, maxTokens = 2000L, maxAvgLenTenths = 120L)
  private val ruleNames = rules.map(_._1)

  /** Replay `batches` of (doc_id, text), return the compacted
    * (rule_no, c) snapshot (latest emit per key).
    */
  private def streamed(batches: Seq[Seq[(Long, String)]], name: String) = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    val query = StreamingMarginals
      .counts(StreamingMarginals.failStream(docs, "doc_id", rules))
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      batches.foreach { b => in.addData(b: _*); query.processAllAvailable() }
      spark.table(name)
        .withColumn("seq", monotonically_increasing_id())
        .groupBy("rule_no")
        .agg(max_by(col("c"), col("seq")).as("c"))
        .localCheckpoint(eager = true)
    } finally query.stop()
  }

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .as[(Long, String, Long, Long, Option[Double])].collect().toSeq

  // the F1s planted corpus: docs failing different rule subsets (the
  // marginal view counts a doc under EVERY rule it fails, unlike the
  // cascade's first-fail attribution), plus a null text that fails
  // every text rule via the NOT-coalesce discipline
  private val docs: Seq[(Long, String)] = Seq(
    1L -> "the quick brown fox jumps over lazy dogs today",
    2L -> "the cat sat",
    3L -> "a b c d e f g h",
    4L -> "quick brown foxes jump high walls",
    5L -> "the cat!!! sat??? mat;;; now... yes!!! ok???",
    6L -> "the CATS SAT ON MATS AND RAN FAR NOW",
    7L -> "the slow green turtle walks under heavy rain",
    8L -> "of a to",
    9L -> (null: String))

  test("replayed marginals equal batch under any micro-batch split") {
    val snap = streamed(
      Seq(docs.take(3), docs.slice(3, 6), docs.drop(6)), "marginals_all")
    val batch = QualityCascade
      .marginals(docs.toDF("doc_id", "text"), "doc_id", rules)
    assert(rows(StreamingMarginals.table(snap, ruleNames)) == rows(batch))
  }

  test("single-batch replay matches too (no split sensitivity)") {
    val snap = streamed(Seq(docs), "marginals_one")
    val batch = QualityCascade
      .marginals(docs.toDF("doc_id", "text"), "doc_id", rules)
    assert(rows(StreamingMarginals.table(snap, ruleNames)) == rows(batch))
  }

  test("a multi-rule failing doc counts under every rule it fails") {
    // doc 9 (null text): every predicate is NULL -> fails closed on
    // ALL six rules in the marginal view (the cascade attributes it
    // to rule 0 only — the views must differ exactly here)
    val snap = streamed(Seq(docs), "marginals_nulldoc")
    val m = rows(StreamingMarginals.table(snap, ruleNames))
      .map(r => r._2 -> r._3).toMap
    // min_tokens fails for docs 2 ("the cat sat"), 8 ("of a to"),
    // and 9 (null)
    assert(m("min_tokens") == 3L)
    // has_stopword fails for 4 ("quick brown foxes...") and 9
    assert(m("has_stopword") == 2L)
  }
}
