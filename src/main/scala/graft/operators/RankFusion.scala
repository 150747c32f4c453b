package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S10: reciprocal-rank fusion (SURVEY.md §2.3) — the standard way a
  * retrieval pipeline combines heterogeneous ranking arms (keyword
  * BM25 + dense ANN, or two ANN index layouts) without calibrating
  * their incomparable scores: only RANKS cross arms,
  *
  *   rrf(item) = Σ_arms 1/(c + rank_arm(item))      (Cormack et al.,
  *                                                   c = 60 standard)
  *
  * Exactness: each reciprocal is quantized to the integer micro
  * ladder (`round(10⁶/(c + rank))` — one IEEE division of exact
  * integers then one half-up round, identical cross-engine), so the
  * fused score is an order-free exact integer sum and the output
  * ranking has no float-accumulation ambiguity; ties break on the
  * item id.
  *
  * Scale shape: a union of the arms' (query, item, rank) frames
  * (each arm already top-k-bounded by its own retrieval, so the
  * union is queries × arms × k rows — never corpus-sized), ONE
  * map-side-combinable grouped sum on (query, item), and a per-query
  * top-k window (partition-local sort over ≤ arms·k candidates).
  */
object RankFusion {

  /** Fuse ranking arms. Each arm: (queryCol, itemCol, rankCol) with
    * rank ≥ 1 — ENFORCED: a rank < 1 raises at execution time rather
    * than contributing a divide-by-zero/negative reciprocal (with
    * c = 0, rank = 0 would yield a NULL contribution silently dropped
    * from the sum yet still counted in n_arms). Precondition that is
    * documented, not enforced: each arm holds at most ONE row per
    * (query, item) — retrieval top-k output by construction; a
    * duplicate would double-count both rrf_micro and n_arms, and
    * deduping here would cost an extra per-arm shuffle the honest
    * caller never needs. Returns per query the top `k` fused items:
    * (query, rnk, item, rrf_micro, n_arms).
    */
  def rrf(arms: Seq[DataFrame], queryCol: String, itemCol: String,
      rankCol: String, k: Int, c: Long = 60L): DataFrame = {
    require(arms.nonEmpty, "need at least one arm")
    require(k > 0 && c >= 0, s"k=$k c=$c")
    val shaped = arms.map(_.select(col(queryCol).as("query"),
      col(itemCol).as("item"), col(rankCol).cast("long").as("rank")))
    val u = shaped.reduce(_.unionByName(_))
    val contrib = when(col("rank") >= 1,
        round(lit(1000000.0) / (lit(c) + col("rank")), 0).cast("long"))
      .otherwise(raise_error(lit(
        "RankFusion.rrf: rank must be >= 1 (got a rank < 1 row)")))
    val w = Window.partitionBy(col("query"))
      .orderBy(col("rrf_micro").desc, col("item"))
    u.select(col("query"), col("item"), contrib.as("__c"))
      .groupBy(col("query"), col("item"))
      .agg(sum(col("__c")).as("rrf_micro"), count(lit(1)).as("n_arms"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query"), col("rnk"), col("item"), col("rrf_micro"),
        col("n_arms"))
  }
}
