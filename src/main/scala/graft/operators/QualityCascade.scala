package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** F1: quality filter cascade with per-rule attrition (SURVEY.md
  * §2.3) — the C4/Gopher-style rule stack as ONE operator whose
  * output is the datasheet table every corpus release reports: for
  * each rule, how many documents reached it and how many it dropped.
  *
  * Semantics: rules apply IN ORDER and a document is attributed to
  * the FIRST rule it fails (the cascade view — rule i's counts answer
  * "of the docs that survived rules 0..i-1, how many does i cost?",
  * which is the number you tune thresholds by; independent per-rule
  * marginals are a different question and already served by T1's
  * per-doc stats). A NULL predicate counts as failing — the V1
  * `NOT coalesce(pred, FALSE)` discipline, so a malformed doc can
  * never pass a rule by making it unevaluable.
  *
  * Scale shape: the verdict is ONE row-local CASE chain (pure codegen
  * map — pipelines inside the scan at 100 TB), the attrition is one
  * map-side-combinable groupBy on a ≤ nRules+1 key domain, and the
  * reached/rate arithmetic runs on that config-sized frame (the
  * window below sorts ≤ nRules+1 rows, not data).
  */
object QualityCascade {

  /** Per-doc verdict: (doc_id, verdict) where verdict = index of the
    * first failing rule, or nRules if the doc passes all (kept).
    */
  def verdicts(df: DataFrame, idCol: String,
      rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val verdict = rules.zipWithIndex.foldRight(
      lit(rules.length).cast("long")) { case (((_, pred), i), acc) =>
      when(!coalesce(pred, lit(false)), lit(i.toLong)).otherwise(acc)
    }
    df.select(col(idCol).as("doc_id"), verdict.as("verdict"))
  }

  /** The attrition table: (rule_no, rule, n_reached, n_dropped,
    * drop_rate) per rule in cascade order, plus a terminal 'kept' row
    * (n_reached = survivors, n_dropped = 0). drop_rate is NULL when
    * nothing reached the rule.
    */
  def attrition(df: DataFrame, idCol: String,
      rules: Seq[(String, Column)]): DataFrame =
    assemble(verdicts(df, idCol, rules)
      .groupBy("verdict").agg(count(lit(1)).as("c")), rules.map(_._1))

  /** The config-sized tail: a (verdict, c) count frame — from the
    * batch groupBy above, or from the streaming twin's compacted
    * per-verdict state snapshot — assembled into the attrition table.
    * Shared verbatim between both paths so batch/stream parity holds
    * by construction.
    */
  def assemble(counts: DataFrame, ruleNames: Seq[String]): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    val ruleRows = ruleNames.zipWithIndex.map { case (name, i) =>
      (i.toLong, name)
    } :+ (ruleNames.length.toLong, "kept")
    val frame = ruleRows.toDF("rule_no", "rule")
      .join(counts, col("rule_no") === col("verdict"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val before = Window.orderBy(col("rule_no"))
      .rowsBetween(Window.unboundedPreceding, -1)
    frame
      .withColumn("n_reached",
        sum(col("c")).over(Window.partitionBy()) -
          coalesce(sum(col("c")).over(before), lit(0L)))
      .withColumn("n_dropped",
        when(col("rule_no") < ruleNames.length, col("c")).otherwise(lit(0L)))
      .withColumn("drop_rate",
        when(col("n_reached") > 0,
          round(col("n_dropped") / col("n_reached"), 6)))
      .select("rule_no", "rule", "n_reached", "n_dropped", "drop_rate")
      .orderBy("rule_no")
  }

  /** F2: independent per-rule marginals — the cascade's complement:
    * how many documents fail EACH rule regardless of position (a rule
    * late in the cascade can look cheap only because earlier rules
    * already ate its failures; the marginal view is what decides
    * whether a rule earns its slot at all). ONE map-side-combinable
    * aggregation over the corpus (nRules conditional sums + a count
    * in a single pass — the R8 wide-agg device), then a config-sized
    * explode of the one result row into the per-rule table. Same
    * NULL-fails-closed predicate discipline as the cascade.
    */
  def marginals(df: DataFrame, idCol: String,
      rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val aggs = rules.zipWithIndex.map { case ((_, pred), i) =>
      sum(when(!coalesce(pred, lit(false)), lit(1L)).otherwise(lit(0L)))
        .as(s"__f$i")
    } :+ count(lit(1)).as("__n")
    // one agg row -> the (rule_no, c) counts frame (fail counters on
    // keys 0..nRules-1, the doc count on key nRules) — the same shape
    // the streaming twin's state snapshot compacts to, so the
    // assembleMarginals tail below is SHARED code in both paths
    val entries = array((rules.zipWithIndex.map { case (_, i) =>
      struct(lit(i.toLong).as("rule_no"),
        coalesce(col(s"__f$i"), lit(0L)).as("c"))
    } :+ struct(lit(rules.length.toLong).as("rule_no"),
      col("__n").as("c"))).toIndexedSeq: _*)
    assembleMarginals(
      df.agg(aggs.head, aggs.tail: _*)
        .select(explode(entries).as("e"))
        .select(col("e.rule_no").as("rule_no"), col("e.c").as("c")),
      rules.map(_._1))
  }

  /** The config-sized marginals tail: a (rule_no, c) counts frame —
    * from the batch wide-agg above, or from the streaming twin's
    * compacted per-key state snapshot (F2s) — assembled into the
    * per-rule marginals table. Key nRules carries n_docs. Shared
    * verbatim between both paths, the [[assemble]] convention.
    */
  def assembleMarginals(counts: DataFrame,
      ruleNames: Seq[String]): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    val ruleRows = ruleNames.zipWithIndex.map { case (name, i) =>
      (i.toLong, name)
    }.toDF("rule_no", "rule")
    val nDocs = counts.filter(col("rule_no") === ruleNames.length.toLong)
      .agg(coalesce(sum(col("c")), lit(0L)).as("n_docs"))
    ruleRows
      .join(counts.filter(col("rule_no") < ruleNames.length.toLong),
        Seq("rule_no"), "left")
      .withColumn("n_failed", coalesce(col("c"), lit(0L)))
      .crossJoin(broadcast(nDocs))
      .select(col("rule_no"), col("rule"), col("n_failed"), col("n_docs"),
        when(col("n_docs") > 0,
          round(col("n_failed") / col("n_docs"), 6)).as("fail_rate"))
      .orderBy("rule_no")
  }

  /** The gate's rule stack over the documents table — every predicate
    * an INTEGER comparison (ratio thresholds cross-multiplied, e.g.
    * punct/chars <= 1/5 as 5*punct <= chars; the avg-token-length cap
    * in tenths as 10*totLen <= maxAvgLenTenths*nTokens) so the
    * verdict has no float boundary anywhere and any engine reproduces
    * it exactly. Thresholds are the cascade's config knobs.
    */
  def documentRules(textCol: Column, minTokens: Long = 20L,
      maxTokens: Long = 80L,
      maxAvgLenTenths: Long = 45L): Seq[(String, Column)] = {
    val toks = Dedup.tokens(textCol)
    val nTokens = size(toks).cast("long")
    // Column-built (not SQL-string-interpolated) so any text column
    // expression works — the readability()/urlDomainsPsl idiom
    val totLen = aggregate(toks, lit(0L), (a, t) => a + length(t))
    val nStop = size(filter(toks,
      t => t.isInCollection(TextAnalysis.Stopwords))).cast("long")
    val nPunct = length(regexp_replace(textCol, "[A-Za-z0-9\\s]", "")).cast("long")
    val nUpper = length(regexp_replace(textCol, "[^A-Z]", "")).cast("long")
    val nChars = length(textCol).cast("long")
    Seq(
      "min_tokens" -> (nTokens >= minTokens),
      "max_tokens" -> (nTokens <= maxTokens),
      "avg_token_len" ->
        (totLen >= nTokens * 2L && totLen * 10L <= nTokens * maxAvgLenTenths),
      "has_stopword" -> (nStop >= 1L),
      "punct_ratio" -> (nPunct * 5L <= nChars),
      "upper_ratio" -> (nUpper * 2L <= nChars))
  }
}
