package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.QualityCascade

class StreamingCascadeSpec extends SparkSuite {
  import spark.implicits._

  // lenient thresholds so the planted docs spread across verdicts
  private val rules = QualityCascade.documentRules(col("text"),
    minTokens = 5L, maxTokens = 2000L, maxAvgLenTenths = 120L)
  private val ruleNames = rules.map(_._1)

  /** Replay `batches` of (doc_id, text), return the compacted
    * (verdict, c) snapshot (latest emit per verdict).
    */
  private def streamed(batches: Seq[Seq[(Long, String)]], name: String) = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    val query = StreamingCascade
      .counts(StreamingCascade.verdictStream(docs, "doc_id", rules))
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      batches.foreach { b => in.addData(b: _*); query.processAllAvailable() }
      spark.table(name)
        .withColumn("seq", monotonically_increasing_id())
        .groupBy("verdict")
        .agg(max_by(col("c"), col("seq")).as("c"))
        .localCheckpoint(eager = true)
    } finally query.stop()
  }

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .as[(Long, String, Long, Long, Option[Double])].collect().toSeq

  // one doc per verdict class (the batch spec's planted corpus) plus
  // repeats so counts accumulate, and a null text (verdict 0 via the
  // NOT-coalesce discipline)
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

  test("replayed attrition equals batch under any micro-batch split") {
    // split so the kept and min_tokens verdicts accumulate ACROSS
    // batches (cross-batch state exercised)
    val snap = streamed(
      Seq(docs.take(3), docs.slice(3, 6), docs.drop(6)), "cascade_all")
    val batch = QualityCascade
      .attrition(docs.toDF("doc_id", "text"), "doc_id", rules)
    assert(rows(StreamingCascade.table(snap, ruleNames)) == rows(batch))
  }

  test("single-batch replay matches too (no split sensitivity)") {
    val snap = streamed(Seq(docs), "cascade_one")
    val batch = QualityCascade
      .attrition(docs.toDF("doc_id", "text"), "doc_id", rules)
    assert(rows(StreamingCascade.table(snap, ruleNames)) == rows(batch))
  }
}
