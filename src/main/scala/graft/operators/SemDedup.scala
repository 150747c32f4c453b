package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (SURVEY.md §2.3 D9): cluster
  * the embedding space, then prune near-duplicates WITHIN each cluster —
  * the cluster-then-prune recipe published for web-scale corpora, where
  * all-pairs cosine is impossible but per-cluster pairs are cheap.
  *
  * Two deliberate choices keep the operator deterministic and
  * 100 TB-shaped:
  *
  *  - Clusters are the deterministic IVF cells
  *    ([[IvfIndex.buildDeterministic]]): lowest-id seed centroids, every
  *    vector to its L2-nearest cell. An external engine reproduces the
  *    assignment bit-for-bit, so the oracle can check the WHOLE
  *    operator, not just the prune step. (The k-means refinement lives
  *    behind [[IvfIndex.build]] for production clustering; swapping it
  *    in changes no downstream shape.)
  *  - The prune rule is lower-id dominance: a vector is dropped iff some
  *    LOWER-id vector in the same cell has cosine >= tau to it.
  *    Survivors are exactly the vectors with no similar lower-id
  *    cell-mate — order-free, join-expressible, and independent of any
  *    sequential scan (a greedy chain walk would serialize the cell).
  *
  * The pair join shuffles on the cell id, so candidate volume is
  * sum(cell^2) not corpus^2 — at scale `nlist` grows with the corpus to
  * bound cell sizes (same discipline as the dedup band buckets).
  */
object SemDedup {

  /** Per-vector verdict: (vec_id, cell, n_sim_lower, kept 0/1,
    * max_cos_lower rounded to 6, null when no lower-id cell-mate
    * clears tau).
    */
  def semDedup(vecs: DataFrame, idCol: String, vecCol: String,
      nlist: Int, tau: Double): DataFrame = {
    val mat = Materializer.of(vecs.sparkSession)
    // One IVF assignment pass feeds both sides of the pair join and the
    // verdict join-back — materialize it once.
    val cells = mat(
      IvfIndex.buildDeterministic(vecs, idCol, vecCol, nlist).cells)
    val a = cells.as("a")
    val b = cells.as("b")
    val cos = Similarity.cosine(Similarity.dotD(col("a.v"), col("b.v")),
      col("a.nrm2"), col("b.nrm2"))
    // a = the candidate victim, b = its lower-id cell-mates.
    val simLower = a
      .join(b, col("a.cell") === col("b.cell") &&
        col("b.vec_id") < col("a.vec_id"))
      .withColumn("cos", cos)
      .filter(col("cos") >= tau)
      .groupBy(col("a.vec_id").as("vec_id"))
      .agg(count(lit(1)).as("n_sim_lower"), max(col("cos")).as("__mx"))
    cells.select(col("vec_id"), col("cell").cast("long").as("cell"))
      .join(simLower, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("n_sim_lower"), lit(0L)).as("n_sim_lower"),
        when(col("n_sim_lower").isNull, lit(1L)).otherwise(lit(0L))
          .as("kept"),
        round(col("__mx"), 6).as("max_cos_lower"))
  }

  /** Incremental semantic dedup — classify an INCOMING batch against an
    * EXISTING corpus without ever pairing the corpus with itself (the
    * [[Dedup.incremental]] contract, in embedding space): the corpus's
    * deterministic IVF cells are the blocking structure, the incoming
    * batch routes onto them via the config-sized centroid array (a
    * zero-shuffle map — see [[IvfIndex.assign]]), and the only pair
    * join is incoming x corpus cell-mates. One row per incoming vector:
    * status near_dup | new, match_id = the smallest similar corpus id
    * (null for new), n_sim, max_cos.
    */
  def semDedupIncremental(corpus: DataFrame, incoming: DataFrame,
      idCol: String, vecCol: String, nlist: Int, tau: Double): DataFrame = {
    val mat = Materializer.of(corpus.sparkSession)
    val index = IvfIndex.buildDeterministic(corpus, idCol, vecCol, nlist)
    val corpusCells = mat(index.cells)
    val inCells = mat(IvfIndex.assign(index.centroids, incoming, idCol, vecCol))
    val cos = Similarity.cosine(Similarity.dotD(col("a.v"), col("b.v")),
      col("a.nrm2"), col("b.nrm2"))
    val sims = inCells.as("a")
      .join(corpusCells.as("b"), col("a.cell") === col("b.cell"))
      .withColumn("cos", cos)
      .filter(col("cos") >= tau)
      .groupBy(col("a.vec_id").as("vec_id"))
      .agg(min(col("b.vec_id")).as("match_id"),
        count(lit(1)).as("n_sim"), max(col("cos")).as("__mx"))
    inCells.select(col("vec_id"), col("cell").cast("long").as("cell"))
      .join(sims, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        when(col("match_id").isNull, lit("new")).otherwise(lit("near_dup"))
          .as("status"),
        col("match_id"),
        coalesce(col("n_sim"), lit(0L)).as("n_sim"),
        round(col("__mx"), 6).as("max_cos"))
  }

  /** C9: SEMANTIC decontamination — the [[Dedup.scrubContamination]]
    * question asked in embedding space: flag every TRAINING vector
    * whose cosine to ANY evaluation vector reaches `tau` (the
    * paraphrased / lightly-reworded eval item an n-gram scrub cannot
    * see). One row per train vector: status contaminated | clean,
    * match_id = smallest similar eval id, n_sim, max_cos.
    *
    * Shape: the blocking structure is built on the EVAL side — the
    * small side by construction (eval suites are thousands of rows
    * against a 100 TB train corpus), so its deterministic IVF cells
    * and centroid array are config-sized and the cell table is
    * BROADCAST. Train vectors route onto those cells with
    * `nprobe`-cell probing (a zero-shuffle row-local map over the
    * centroid literals; nprobe > 1 buys back the boundary recall a
    * single-cell assignment loses), so the whole operator is one
    * broadcast LEFT join + ONE train-keyed conditional aggregation —
    * never train x train; the only train-sized exchange is that
    * aggregation's compact (id, partials) shuffle after map-side
    * combine. The left join + explode_outer keep no-partner and
    * null-vector train rows flowing to a 'clean' verdict without a
    * second train-sized join (which would plan the large x large
    * SortMergeJoin the plan audit forbids).
    * Each eval vector lives in exactly one cell, so a (train, eval)
    * pair appears at most once even under multi-probe.
    */
  def scrubSemantic(train: DataFrame, eval: DataFrame, idCol: String,
      vecCol: String, nlist: Int, tau: Double, nprobe: Int = 2): DataFrame = {
    val mat = Materializer.of(train.sparkSession)
    val index = IvfIndex.buildDeterministic(eval, idCol, vecCol, nlist)
    val np = math.min(nprobe, index.centroids.length)
    val evalCells = mat(index.cells)
    // explode_outer + left join: a train row with no probed-cell
    // partner (or a null vector, whose probe list is null) still
    // reaches the aggregation and verdicts 'clean' — so the per-train
    // verdict needs NO second train-sized join: one scan, one
    // broadcast hash join, ONE groupBy shuffle on vec_id (the r13
    // plan-audit fix: the previous train x sims left join planned a
    // large x large SortMergeJoin that this conditional agg deletes)
    val tr = Similarity.withNorm(train, idCol, vecCol)
      .withColumn("cell",
        explode_outer(IvfIndex.probeCells(col("v"), col("nrm2"),
          index.centroids, np)))
    val cos = Similarity.cosine(Similarity.dotD(col("a.v"), col("b.v")),
      col("a.nrm2"), col("b.nrm2"))
    val hit = when(col("cos") >= tau, lit(1))
    tr.as("a")
      .join(broadcast(evalCells.as("b")),
        col("a.cell") === col("b.cell"), "left")
      .withColumn("cos", cos)
      .groupBy(col("a.vec_id").as("vec_id"))
      .agg(min(when(col("cos") >= tau, col("b.vec_id"))).as("match_id"),
        count(hit).as("n_sim"),
        max(when(col("cos") >= tau, col("cos"))).as("__mx"))
      .select(col("vec_id"),
        when(col("match_id").isNull, lit("clean"))
          .otherwise(lit("contaminated")).as("status"),
        col("match_id"),
        col("n_sim"),
        round(col("__mx"), 6).as("max_cos"))
  }
}
