package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Text-analysis operators for training pipelines (SURVEY.md §2.3
  * T1-T4): quality stats, language-ID, token counting, fingerprinting.
  * All scalar work is built-in functions / higher-order lambdas — fully
  * codegen'd, no UDFs, embarrassingly parallel (no shuffle except the
  * explicitly-keyed aggregations).
  */
object TextAnalysis {

  val Stopwords: Seq[String] = Seq("the", "a", "of", "to", "and", "in", "is")
  val Langs: Seq[String] = Seq("en", "es", "de", "fr", "zh")

  def tokens(text: Column): Column = Dedup.tokens(text)

  /** T1: per-document quality statistics. Ratios divide exact ints in
    * double — bit-identical to the oracle; no transcendentals (libm
    * results differ across engines).
    */
  def textStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val stopList = Stopwords.map(s => s"'$s'").mkString(", ")
    df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("avg_token_len",
        round(expr("aggregate(toks, 0L, (a, t) -> a + length(t))") / col("n_tokens"), 4))
      .withColumn("stop_ratio",
        expr(s"size(filter(toks, t -> t IN ($stopList)))") / col("n_tokens"))
      .withColumn("punct_ratio",
        length(regexp_replace(col("text"), "[A-Za-z0-9\\s]", "")) / length(col("text")))
      .withColumn("upper_ratio",
        length(regexp_replace(col("text"), "[^A-Z]", "")) / length(col("text")))
      .withColumn("quality",
        round(least(lit(1.0), col("n_tokens") / 100.0) *
          (lit(1.0) - col("punct_ratio")) * (lit(1.0) - col("stop_ratio")), 4))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        col("avg_token_len"), round(col("stop_ratio"), 4).as("stop_ratio"),
        round(col("punct_ratio"), 4).as("punct_ratio"),
        round(col("upper_ratio"), 4).as("upper_ratio"), col("quality"))
  }

  /** T2: language identification by marker-token voting. Each token
    * votes for the language its hash maps to (a stand-in for a real
    * marker lexicon — deterministic so the oracle replicates it); the
    * prediction is the argmax with (count desc, bucket asc) tie-break.
    */
  def langId(df: DataFrame, idCol: String, textCol: String,
      trueLangCol: String): DataFrame = {
    val toks = df
      .select(col(idCol).as("doc_id"), col(trueLangCol).as("lang"),
        explode(tokens(col(textCol))).as("tok"))
      .withColumn("bucket", Hashing.md5Long60(col("tok")) % Langs.length)
    val cnt = toks.groupBy("doc_id", "lang", "bucket")
      .agg(count(lit(1)).as("c"))
    val tot = Window.partitionBy(col("doc_id"))
    val rn = Window.partitionBy(col("doc_id"))
      .orderBy(col("c").desc, col("bucket"))
    val predExpr = Langs.zipWithIndex
      .foldLeft(lit(null).cast("string")) { case (acc, (l, i)) =>
        when(col("bucket") === i, lit(l)).otherwise(acc)
      }
    cnt
      .withColumn("n_tokens", sum(col("c")).over(tot))
      .withColumn("rn", row_number().over(rn))
      .filter(col("rn") === 1)
      .select(col("doc_id"), predExpr.as("pred_lang"),
        round(col("c") / col("n_tokens"), 4).as("confidence"),
        col("lang"), (predExpr === col("lang")).as("is_match"))
  }

  /** BPE-ish pre-tokenizer: letter runs, digit runs, single punct.
    * Doubled backslash: the SQL string parser consumes one level, the
    * regex engine sees `\s`.
    */
  val BpeRegexSqlLit: String = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]"

  /** T3: token counting per source — whitespace tokens vs BPE-ish
    * subword units.
    */
  def tokenCounts(df: DataFrame, groupCol: String, textCol: String): DataFrame =
    df.select(col(groupCol).as("source"),
        size(tokens(col(textCol))).cast("long").as("ws"),
        size(expr(s"regexp_extract_all($textCol, '$BpeRegexSqlLit', 0)"))
          .cast("long").as("bpe"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws")).as("ws_tokens"),
        sum(col("bpe")).as("bpe_tokens"),
        round(avg(col("bpe")), 4).as("avg_bpe_per_doc"))

  /** T4: positional rolling-hash document fingerprint — xor of each
    * token's 30-bit hash rotated by its position; order-sensitive
    * (anagram documents get different fingerprints), overflow-free.
    */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
      .select(col("doc_id"),
        Hashing.h30(col("tok")).as("h"), (col("pos") % 30).as("s"))
      .select(col("doc_id"),
        expr("(shiftleft(h, s) | shiftright(h, 30 - s)) & 1073741823").as("v"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), expr("bit_xor(v)").as("fp"))
}
