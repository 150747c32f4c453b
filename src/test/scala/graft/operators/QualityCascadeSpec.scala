package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class QualityCascadeSpec extends SparkSuite {
  import spark.implicits._

  private def table(df: org.apache.spark.sql.DataFrame) = df
    .as[(Long, String, Long, Long, Option[Double])].collect().toSeq

  test("first-failing-rule attribution and the attrition arithmetic") {
    // simple integer rules so every verdict is hand-checkable
    val rules = Seq(
      "ge10" -> (col("x") >= 10),
      "even" -> (col("x") % 2 === 0),
      "lt90" -> (col("x") < 90))
    // x: 5 fails ge10; 15 fails even (passes ge10); 94 fails lt90
    // (passes ge10+even); 20, 44 pass all; 3 fails ge10 too
    val df = Seq(5L, 15L, 94L, 20L, 44L, 3L).toDF("x")
      .withColumn("id", col("x"))
    val got = table(QualityCascade.attrition(df, "id", rules))
    assert(got == Seq(
      (0L, "ge10", 6L, 2L, Some(0.333333)),
      (1L, "even", 4L, 1L, Some(0.25)),
      (2L, "lt90", 3L, 1L, Some(0.333333)),
      (3L, "kept", 2L, 0L, Some(0.0))))
  }

  test("a doc failing several rules is counted ONCE, at the first") {
    val rules = Seq("a" -> (col("x") > 0), "b" -> (col("x") > 0))
    val df = Seq(-1L).toDF("x").withColumn("id", col("x"))
    val got = table(QualityCascade.attrition(df, "x", rules))
    // attributed to rule a only; rule b reached by nobody -> NULL rate
    assert(got == Seq(
      (0L, "a", 1L, 1L, Some(1.0)),
      (1L, "b", 0L, 0L, None),
      (2L, "kept", 0L, 0L, None)))
  }

  test("NULL predicate counts as failing (the V1 discipline)") {
    val rules = Seq("notnull" -> (col("x") > 0))
    val df = Seq[Option[Long]](Some(1L), None).toDF("x")
      .withColumn("id", monotonically_increasing_id())
    val got = table(QualityCascade.attrition(df, "id", rules))
    assert(got.head == (0L, "notnull", 2L, 1L, Some(0.5)))
  }

  test("document rule stack: each rule catches its planted doc") {
    val docs = Seq(
      // kept: >=5 tokens, has stopword, sane ratios
      (1L, "the quick brown fox jumps over lazy dogs today"),
      // min_tokens: 3 tokens
      (2L, "the cat sat"),
      // avg_token_len: single-char tokens (avg 1 < 2); passes length
      (3L, "a b c d e f g h"),
      // has_stopword: >=5 tokens, no stopword from the list
      (4L, "quick brown foxes jump high walls"),
      // punct_ratio: >20% punctuation
      (5L, "the cat!!! sat??? mat;;; now... yes!!! ok???"),
      // upper_ratio: shouting (>50% uppercase letters of all chars;
      // the lowercase 'the' keeps it past has_stopword first)
      (6L, "the CATS SAT ON MATS AND RAN FAR NOW"))
      .toDF("doc_id", "text")
    // lenient thresholds so each planted doc reaches its target rule
    val verdicts = QualityCascade
      .verdicts(docs, "doc_id", QualityCascade.documentRules(col("text"),
        minTokens = 5L, maxTokens = 2000L, maxAvgLenTenths = 120L))
      .as[(Long, Long)].collect().toMap
    assert(verdicts == Map(1L -> 6L, 2L -> 0L, 3L -> 2L, 4L -> 3L,
      5L -> 4L, 6L -> 5L))
  }

  test("marginals count each rule independently, not first-fail") {
    val rules = Seq(
      "ge10" -> (col("x") >= 10),
      "even" -> (col("x") % 2 === 0),
      "lt90" -> (col("x") < 90))
    val df = Seq(5L, 15L, 94L, 20L, 44L, 3L).toDF("x")
    val got = QualityCascade.marginals(df, "x", rules)
      .as[(Long, String, Long, Long, Option[Double])].collect().toSeq
    // cascade attributed even's failures as 1 (15 only — 5 and 3 died
    // at ge10); the marginal view sees all 3 odd docs
    assert(got == Seq(
      (0L, "ge10", 2L, 6L, Some(0.333333)),
      (1L, "even", 3L, 6L, Some(0.5)),
      (2L, "lt90", 1L, 6L, Some(0.166667))))
  }

  test("verdicts + attrition stay consistent (sum of drops = total)") {
    val docs = Seq.tabulate(50)(i => (i.toLong, s"doc $i " + ("w " * (i % 9))))
      .toDF("doc_id", "text")
    val rules = QualityCascade.documentRules(col("text"))
    val t = table(QualityCascade.attrition(docs, "doc_id", rules))
    // every doc lands exactly once: drops across rules + survivors = total
    assert(t.map(_._4).sum + t.last._3 == 50L)
    // n_reached decreases monotonically by exactly the drops above
    t.sliding(2).foreach { case Seq(a, b) =>
      assert(b._3 == a._3 - a._4)
    }
  }
}
