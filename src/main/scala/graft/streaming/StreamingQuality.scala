package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Streaming counterpart of the batch bigram-LM quality filter
  * (graft.operators.TextAnalysis.bigramLmScore): the model — the two
  * MLE count tables — is trained OFFLINE on a curated corpus; the
  * live document stream is scored against it continuously. Train
  * offline / score online is the same deployment split as
  * [[StreamingAnomaly]], and the scoring arithmetic is the SAME
  * definitions the batch operator uses (`microLogProb`,
  * `halfAwayMean4`) — one contract, zero train/serve drift.
  *
  * Scale shape: bigrams explode in-stream and resolve through two
  * stream-static equi joins (unhinted — the planner broadcasts a
  * small model and shuffles a web-scale one); the per-document mean
  * is ONE streaming aggregation keyed by (event time, doc id), so
  * append mode finalizes each document when the watermark passes its
  * timestamp and state is bounded by the watermark horizon — never by
  * stream history.
  */
object StreamingQuality {

  /** Persisted model tables with owned lifecycle: [[unpersist]] when
    * the scoring query stops (or on model refresh). The convenience
    * [[score]] cannot hand this back, so deployments that restart
    * queries should build the handle themselves via [[model]] +
    * [[scoreWithModel]].
    */
  final case class BigramModelHandle(c12: DataFrame, c1: DataFrame) {
    def unpersist(): Unit = { c12.unpersist(); c1.unpersist() }
  }

  /** Fit the bigram model on `train` and persist both count tables
    * (a stream-static join re-runs its static subplan every
    * microbatch; without the persist each trigger would pay both model
    * groupBys over the full train corpus). The returned handle owns
    * the cache lifecycle.
    */
  def model(train: DataFrame, idCol: String, textCol: String): BigramModelHandle = {
    val (c12, c1) = TextAnalysis.bigramModel(train, idCol, textCol)
    BigramModelHandle(c12.persist(), c1.persist())
  }

  /** Score a stream of (`idCol`, `textCol`, `tsCol`) docs against the
    * model fit on the static `train` corpus. One row per doc with >= 2
    * tokens: bigram/OOV counts, `avg_logprob`, and the `pass` gate at
    * `thresholdMicro4` (threshold in 1e-4 log-prob units, compared on
    * the exact integer mean — floats never decide the verdict).
    *
    * Convenience entry point: the model tables persist for the life of
    * the session (nothing unpersists them). A deployment that refreshes
    * models or stops queries should call [[model]] + [[scoreWithModel]]
    * and `unpersist()` the handle itself. Re-training means rebuilding
    * and restarting on [[scoreWithModel]] — the model is a static
    * snapshot.
    */
  def score(stream: DataFrame, train: DataFrame,
      idCol: String, textCol: String, tsCol: String,
      watermarkDelay: String, thresholdMicro4: Long): DataFrame = {
    val m = model(train, idCol, textCol)
    scoreWithModel(stream, m.c12, m.c1,
      idCol, textCol, tsCol, watermarkDelay, thresholdMicro4)
  }

  /** Same, against pre-materialized model count tables — the
    * deployment entry point when the model is trained on its own
    * schedule and loaded from storage.
    */
  def scoreWithModel(stream: DataFrame, c12: DataFrame, c1: DataFrame,
      idCol: String, textCol: String, tsCol: String,
      watermarkDelay: String, thresholdMicro4: Long): DataFrame = {
    stream
      .withWatermark(tsCol, watermarkDelay)
      .select(col(tsCol), col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col(tsCol), col("doc_id"), expr(
        "explode(transform(sequence(1, size(toks) - 1), " +
          "i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2)))")
        .as("b"))
      .select(col(tsCol), col("doc_id"),
        col("b.w1").as("w1"), col("b.w2").as("w2"))
      .join(c12, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .withColumn("__lp_micro", TextAnalysis.microLogProb(col("c12"), col("c1")))
      .groupBy(col(tsCol), col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        coalesce(sum(when(col("c12").isNull, 1L)), lit(0L)).as("n_oov"),
        coalesce(sum(col("__lp_micro")), lit(0L)).as("__sum_micro"))
      .withColumn("__m4", TextAnalysis.halfAwayMean4Micro(
        col("__sum_micro"), col("n_bigrams") - col("n_oov")))
      .withColumn("avg_logprob", col("__m4") / 10000.0)
      // the gate compares the INTEGER micro-mean — floats never
      // decide the verdict; an all-OOV doc (null mean) fails closed
      .withColumn("pass", coalesce(col("__m4") >= thresholdMicro4, lit(false)))
      .select(col(tsCol), col("doc_id"), col("n_bigrams"), col("n_oov"),
        col("avg_logprob"), col("pass"))
  }
}
