package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** DSIR-style data selection (SURVEY.md §2.3 P14): score every document
  * by a hashed-n-gram importance weight — log-likelihood ratio of a
  * TARGET distribution (e.g. the curated sources a pretraining mix
  * should look like) against the RAW corpus distribution — and select
  * the top fraction. The published importance-resampling recipe for
  * "pick the web documents that look like Wikipedia", made exact:
  *
  *  - Features are unigrams + bigrams hashed into `nBuckets` buckets
  *    with the cross-engine md5 hash ([[Hashing.h30]]), so the feature
  *    space is fixed-size no matter the corpus (the hashing trick that
  *    makes the method 100 TB-viable: bucket counts are one grouped
  *    count on a `nBuckets`-cardinality key).
  *  - Per-bucket log weights use the bigram-LM integer ladder
  *    ([[TextAnalysis.microLogProb]] discipline): ln rounded to 6
  *    decimals, scaled to integer micro-units — document scores become
  *    order-free integer sums, bit-identical on any engine and any
  *    partitioning.
  *  - Selection is an exact global (score desc, id) rank computed by
  *    the [[RankSelect.globalRowNumber]] bucket-offset device: rows
  *    range-bucket on the score, offsets come from a <=1024-row
  *    histogram window, and each bucket ranks locally under a
  *    bucket-keyed window — no corpus-sized single-partition sort, so
  *    the exact top-k cut survives 100 TB.
  *
  * Laplace (+1) smoothing over `nBuckets` buckets keeps empty buckets
  * finite on both engines.
  */
object Dsir {

  /** Integer-micro log weight of one smoothed bucket probability:
    * round(ln((c+1)/(tot+B)), 6) in 1e-6 units, as a long.
    */
  private def microLogRatio(c: Column, tot: Column, b: Int): Column =
    round(round(log((c + lit(1.0)) / (tot + lit(b.toDouble))), 6) * 1e6)
      .cast("long")

  /** Unigram + bigram array of a whitespace-tokenized text column. */
  private def grams(textCol: Column): Column = {
    val toks = split(trim(textCol), "\\s+")
    val bigrams = zip_with(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (x, y) => concat(x, lit(" "), y))
    concat(toks, bigrams)
  }

  /** Score and rank every document: (doc_id, n_grams, score_micro,
    * sel_rank, selected 0/1). `targetPred` marks the rows defining the
    * target distribution; `selectPermille` of the corpus (floor) is
    * selected by (score desc, id) rank.
    */
  def select(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, nBuckets: Int, selectPermille: Int): DataFrame = {
    val mat = Materializer.of(docs.sparkSession)
    // One tokenize+hash pass feeds both the bucket counts and the
    // per-document scores.
    // r17 opt: the gram explode + per-gram md5 must not run inside a
    // single under-split scan task; doc-keyed so the per-doc score
    // aggregate keeps partial-agg locality (Dedup.withScanParallelism)
    val hashed = mat(Dedup.withScanParallelism(
        docs.select(col(idCol).as("doc_id"), targetPred.as("is_target"),
          col(textCol).as("__text")),
        Seq(col("doc_id")))
      .select(col("doc_id"), col("is_target"),
        explode(grams(col("__text"))).as("gram"))
      .select(col("doc_id"), col("is_target"),
        (Hashing.h30(col("gram")) % nBuckets).as("bucket")))
    val counts = hashed.groupBy(col("bucket"))
      .agg(count(lit(1)).as("r_b"),
        count(when(col("is_target"), 1)).as("t_b"))
    val totals = counts.agg(sum(col("r_b")).as("__r_tot"),
      sum(col("t_b")).as("__t_tot"))
    val lambda = counts.crossJoin(broadcast(totals))
      .select(col("bucket"),
        (microLogRatio(col("t_b"), col("__t_tot"), nBuckets) -
          microLogRatio(col("r_b"), col("__r_tot"), nBuckets)).as("lam"))
    // Materialized: the rank device reads it twice (range stats +
    // bucket keying), and its lineage is the full gram explode.
    val scored = mat(hashed
      .join(broadcast(lambda), "bucket")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("lam")).as("score_micro")))
    val nDocs = docs.agg(count(lit(1)).as("__n_docs"))
    // Exact global (score desc, id) rank via the bucket-offset device
    // — no corpus-sized SinglePartition sort anywhere in the plan; the
    // only global window is over <= 1024 histogram rows.
    RankSelect.globalRowNumber(scored, "score_micro", "sel_rank",
        descending = true, tieBreak = Seq("doc_id"))
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("n_grams"), col("score_micro"),
        col("sel_rank"),
        when(col("sel_rank") <=
            expr(s"__n_docs * $selectPermille div 1000"), lit(1L))
          .otherwise(lit(0L)).as("selected"))
  }
}
