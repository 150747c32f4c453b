package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, HeavyHitters}
import graft.operators.{Bpe, Contamination, Dedup, Drift, Dsir, IvfIndex, Materializer, Multimodal, Overlap, Packing, Pca, PqIndex, Privacy, Psl, Quantization, Release, Sampling, SemDedup, Similarity, Snapshot, TextAnalysis}
import Shared._

/** SURVEY.md §2.3 — training-data pipeline operators over the
  * documents/embeddings corpus. Oracle parity rests on two invariants:
  * every hash is md5-derived (both engines compute identical 60-bit
  * values), and every float threshold is either integer arithmetic
  * (Jaccard) or computed by the bit-identical sequential-fold dot
  * product (cosine).
  */
object PipelineQueries {

  /** Dedup demo corpus: documents unioned with a shifted-id copy of
    * itself, so exact/near-dup operators have true duplicates to find
    * (the raw corpus is 100% distinct texts).
    */
  private def dupCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
    d.union(d.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
  }

  private val dupCorpusSql =
    "SELECT doc_id, text FROM documents UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents"

  // D1: exact dedup by content hash.
  def qDedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(dupCorpus(s, dir), "doc_id", "text").orderBy("content_hash")

  /** Token hash for the dedup queries: md5-derived by default (oracle
    * parity); SPARK_GRAFT_FAST_HASH=1 switches to the xxhash64
    * production path for benchmarking (same pair sets, no oracle).
    */
  private def tokenHash: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    if (sys.env.get("SPARK_GRAFT_FAST_HASH").contains("1"))
      c => Hashing.xx60(c) % 1073741824L
    else Hashing.h30

  /** Hot-bucket caps exercised by the dedup queries — reproduced in the
    * oracle SQL so the capped (100 TB-safe) path is what gets verified.
    */
  val NgramMaxDf = 100L
  val SimhashMaxBucket = 100L

  // D2: n-gram (3-shingle) Jaccard near-dup, tau = 1/2, with the
  // posting-list cap on (runs the production candidate path).
  def qDedupNgram(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccard(dupCorpus(s, dir), "doc_id", "text", 3, 1, 2, tokenHash,
        maxDf = NgramMaxDf)
      .orderBy("doc_a", "doc_b")

  // D3: MinHash+LSH near-dup, same threshold — candidates via band
  // buckets instead of the full inverted index.
  def qDedupMinhash(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLsh(dupCorpus(s, dir), "doc_id", "text", 3, 1, 2, tokenHash)
      .orderBy("doc_a", "doc_b")

  // D10: dedup recall gate — D3 LSH recall against the D2 exact
  // truth set, bucketed by true Jaccard (floor(10j), integer
  // arithmetic); one shared shingle index feeds both chains.
  def qDedupRecall(s: SparkSession, dir: String): DataFrame =
    Dedup.lshRecall(dupCorpus(s, dir), "doc_id", "text", 3, 1, 2, tokenHash,
      maxDf = NgramMaxDf)

  // C7: near-dup split-leakage audit — the check C1's n-gram
  // contamination does for train/test, at the near-duplicate level
  // and across ALL split pairs: route the corpus through the P2 hash
  // split, find D3's MinHash near-dup pairs, and report the pair
  // matrix per (split_a, split_b) with the cross-split rows flagged.
  // A leak means a near-copy of a training document sits in val/test
  // — the eval-inflation failure dedup-then-split is supposed to
  // prevent, audited rather than assumed.
  def qSplitLeakage(s: SparkSession, dir: String): DataFrame = {
    val corpus = dupCorpus(s, dir)
    val pairs = Dedup.minhashLsh(corpus, "doc_id", "text", 3, 1, 2, tokenHash)
      .select(col("doc_a"), col("doc_b"))
    // r17 opt: the split is a pure hash of the doc id
    // (Sampling.hashSplitCol), so both endpoint labels compute
    // row-locally on the pair frame — the former two id-keyed joins
    // against a corpus-derived split table are gone (guide §2.4)
    pairs
      .select(
        graft.operators.Sampling.hashSplitCol(col("doc_a"), 80, 10)
          .as("split_a"),
        graft.operators.Sampling.hashSplitCol(col("doc_b"), 80, 10)
          .as("split_b"))
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("is_leak",
        when(col("split_a") =!= col("split_b"), 1L).otherwise(0L))
      .orderBy("split_a", "split_b")
  }

  // D4: SimHash Hamming<=3 pairs, with the band-width guard on.
  def qDedupSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDup(dupCorpus(s, dir), "doc_id", "text", 3,
        maxBucket = SimhashMaxBucket)
      .orderBy("doc_a", "doc_b")

  // D4b: simhash recall gate — the production 3x10-bit banding (with
  // its hot-bucket guard) measured against the pigeonhole-exact 5x6
  // truth arm, per Hamming distance.
  def qSimhashRecall(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashRecall(dupCorpus(s, dir), "doc_id", "text",
      maxHamming = 3, maxBucket = SimhashMaxBucket)

  // D6: near-dup cluster resolution — connected components over the
  // MinHash+LSH pair graph; every doc labeled with its cluster's
  // minimum doc id (singletons label themselves).
  def qDedupClusters(s: SparkSession, dir: String): DataFrame = {
    val corpus = dupCorpus(s, dir)
    val pairs = Dedup.minhashLsh(corpus, "doc_id", "text", 3, 1, 2, tokenHash)
      .select("doc_a", "doc_b")
    // pairsCanonical: minhashLsh emits unique doc_a < doc_b pairs
    Dedup.clusters(corpus, "doc_id", pairs, pairsCanonical = true)
      .orderBy("doc_id")
  }

  // D11: canonical-survivor selection — D6's clusters resolved to a
  // keep/drop decision per doc: longest text wins its cluster, ties to
  // the smallest doc_id (the dup corpus makes every cluster an exact
  // tie, so the rule's deterministic arm is what gets verified).
  def qDedupKeep(s: SparkSession, dir: String): DataFrame = {
    val corpus = dupCorpus(s, dir)
    val pairs = Dedup.minhashLsh(corpus, "doc_id", "text", 3, 1, 2, tokenHash)
      .select("doc_a", "doc_b")
    Dedup.keepCanonical(corpus, "doc_id", length(col("text")), pairs,
        pairsCanonical = true)
      .orderBy("doc_id")
  }

  // D7: duplicated-passage detection over the raw corpus — 5-gram
  // spans occurring in >= 2 docs, merged and reported per doc with the
  // cleaned-content hash. Runs on the UN-duplicated corpus: the
  // operator's point is finding shared passages inside otherwise
  // distinct documents.
  def qDupPassages(s: SparkSession, dir: String): DataFrame =
    Dedup.dupPassages(t(s, dir, "documents"), "doc_id", "text", 5, 2, tokenHash)
      .orderBy("doc_id")

  // D7b: maximal repeated-substring distribution — the ExactSubstr
  // report over the same corpus: cross-doc 5-gram hits merged into
  // maximal spans, grouped by span length with doc and distinct-
  // substring counts.
  def qDupSubstrings(s: SparkSession, dir: String): DataFrame =
    Dedup.dupSubstrings(t(s, dir, "documents"), "doc_id", "text", 5, 2, tokenHash)

  // D7d: the D7b distribution faceted by crawl source — which slice
  // carries the boilerplate; the repeated-gram test stays global.
  def qDupSubstringsBy(s: SparkSession, dir: String): DataFrame =
    Dedup.dupSubstringsBy(t(s, dir, "documents"), "doc_id", "text",
      "source", 5, 2, tokenHash)

  // D7c: the ExactSubstr removal step at threshold 8 — delete only
  // maximal repeated spans of >= 8 tokens (short incidental overlaps
  // survive), report the cleaned-content hash per affected doc.
  def qDupClean(s: SparkSession, dir: String): DataFrame =
    Dedup.dupCleanAtThreshold(t(s, dir, "documents"), "doc_id", "text", 5,
        minSpanLen = 8, 2, tokenHash)
      .orderBy("doc_id")

  // C8b: per-eval-suite decontamination attribution — the same global
  // scrub decision, faceted by the eval doc's source: which suite
  // forced each removed token (a span hit by two suites counts for
  // both; the datasheet wants blame, not a partition).
  def qDecontaminateBy(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Dedup.scrubAttribution(
      docs.filter(col("doc_id") % 10 =!= 7),
      docs.filter(col("doc_id") % 10 === 7),
      "doc_id", "text", "source", 5, minSpanLen = 8, tokenHash)
  }

  // C8: decontamination scrubbing — remove spans (>= 8 tokens at
  // 5-grams) overlapping the eval split from every training doc; the
  // split is synthesized deterministically (doc_id % 10 == 7 -> eval).
  def qDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Dedup.scrubContamination(
        docs.filter(col("doc_id") % 10 =!= 7),
        docs.filter(col("doc_id") % 10 === 7),
        "doc_id", "text", 5, minSpanLen = 8, tokenHash)
      .orderBy("doc_id")
  }

  // E5: JL projection distortion audit — original vs projected cosine
  // over consecutive-id pairs at k=16 on the 64-dim embeddings.
  def qJlDistortion(s: SparkSession, dir: String): DataFrame =
    graft.operators.Projection.jlDistortion(t(s, dir, "embeddings"),
      "vec_id", "embedding", k = 16, dim = 64)

  // E6: matryoshka-truncation distortion summary at k = 8/16/32 on
  // the 64-dim embeddings.
  def qMrlDistortion(s: SparkSession, dir: String): DataFrame =
    graft.operators.Projection.mrlDistortion(t(s, dir, "embeddings"),
      "vec_id", "embedding", ks = Seq(8, 16, 32))

  // G2: hard-negative recall sweep — recall@5 of the IVF-routed arm
  // vs the brute different-label truth at nprobe 1/2/4 (the S6
  // measured-knob discipline applied to G1).
  def qHardNegSweep(s: SparkSession, dir: String): DataFrame = {
    val mat = Materializer.of(s)
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") < 10)
    val brute = mat(graft.operators.HardNegatives
      .brute(e, q, "vec_id", "embedding", "label", k = 5)
      .select(col("query_id"), col("neighbor_id")))
    val probes = Seq(1, 2, 4)
    // r17 opt: one fused pipeline for all three arms (shared centroid
    // collect, ONE cell join, ONE rank window) — per-arm slices are
    // row-identical to the former per-arm mine() calls (see mineSweep)
    val hits = graft.operators.HardNegatives.mineSweep(e, q, "vec_id",
        "embedding", "label", k = 5, nlist = 16, probes)
      .select(col("nprobe"), col("query_id"), col("neighbor_id"),
        lit(1L).as("__hit"))
    val truth = probes.map(np => brute.withColumn("nprobe", lit(np.toLong)))
      .reduce(_ union _)
    // hits is arms x queries x k rows — bounded by construction at any
    // corpus size, so broadcast explicitly (left-outer can't broadcast
    // the truth side, and the un-executed union's stats read large
    // enough to plan a pointless SMJ otherwise)
    truth.join(broadcast(hits), Seq("nprobe", "query_id", "neighbor_id"), "left")
      .groupBy(col("nprobe"), col("query_id"))
      .agg(count(lit(1)).as("n_true"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_hit"))
      .withColumn("recall", col("n_hit") / col("n_true"))
      .orderBy("nprobe", "query_id")
  }

  // F1: quality filter cascade over documents — per-rule attrition
  // with first-failing-rule attribution (the datasheet table).
  def qFilterCascade(s: SparkSession, dir: String): DataFrame =
    graft.operators.QualityCascade.attrition(t(s, dir, "documents"),
      "doc_id", graft.operators.QualityCascade.documentRules(col("text")))

  // F2: the independent per-rule marginal view of the same stack.
  def qFilterMarginals(s: SparkSession, dir: String): DataFrame =
    graft.operators.QualityCascade.marginals(t(s, dir, "documents"),
      "doc_id", graft.operators.QualityCascade.documentRules(col("text")))

  // G1: hard-negative mining — top-5 different-label neighbors per
  // query (vec_id < 10) through the deterministic IVF cells.
  def qHardNegatives(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    graft.operators.HardNegatives.mine(e, e.filter(col("vec_id") < 10),
      "vec_id", "embedding", "label", k = 5, nlist = 16, nprobe = 4)
      .orderBy("query_id", "rnk")
  }

  // V1: data-contract audit — a 6-check expectation suite over orders
  // plus the customer referential, all in one scan + one broadcast
  // join; the totalprice cap is deliberately tight so the suite
  // exercises a FAILING expectation, not just green ones.
  def qExpectations(s: SparkSession, dir: String): DataFrame =
    graft.operators.Expectations.audit(t(s, dir, "orders"),
      Seq(
        "orderkey_not_null" -> col("o_orderkey").isNotNull,
        "totalprice_positive" -> (col("o_totalprice") > 0),
        "totalprice_under_cap" -> (col("o_totalprice") <= 300000.0),
        "status_in_domain" -> col("o_orderstatus").isin("O", "F", "P"),
        "priority_format" -> col("o_orderpriority").rlike("^[1-5]-"),
        "orderdate_in_range" ->
          col("o_orderdate").between("1992-01-01", "1998-12-31")),
      Seq(("custkey_referential", "o_custkey",
        t(s, dir, "customer"), "c_custkey")))

  // D8: incremental dedup — ingest-time classification of a new batch
  // against the already-curated corpus (never corpus x corpus). The
  // incoming batch is synthesized from the corpus: exact copies
  // (doc_id%10==0), one-token-appended near-dups (%10==1), novel docs
  // (%10==2). Near-dup recall goes through the band join in BOTH
  // engines, so labels agree even where LSH recall is probabilistic.
  def qDedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val idStr = col("doc_id").cast("string")
    val incoming = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
      .union(docs.filter(col("doc_id") % 10 === 1)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          concat(col("text"), lit(" zzappended")).as("text")))
      .union(docs.filter(col("doc_id") % 10 === 2)
        .select((col("doc_id") + 4000000L).as("doc_id"),
          concat(lit("qqa"), idStr, lit(" qqb"), idStr,
            lit(" qqc"), idStr, lit(" qqd"), idStr).as("text")))
    Dedup.incremental(docs, incoming, "doc_id", "text", 3, 1, 2, tokenHash)
      .orderBy("doc_id")
  }

  // D5: embedding cosine near-dup, label-blocked, tau = 0.3.
  def qDedupEmbed(s: SparkSession, dir: String): DataFrame =
    Similarity.cosinePairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        "label", 0.3)
      .orderBy("id_a", "id_b")

  // D9: SemDeDup — cluster-then-prune semantic dedup on the
  // deterministic IVF cells (16 cells, tau = 0.3, lower-id dominance).
  // Oracle-checked end-to-end: cell assignment, within-cell pair set,
  // and per-vector verdict.
  def qDedupSemantic(s: SparkSession, dir: String): DataFrame =
    SemDedup.semDedup(t(s, dir, "embeddings"), "vec_id", "embedding",
        nlist = 16, tau = 0.3)
      .orderBy("vec_id")

  // D9b: incremental SemDeDup — a synthesized incoming batch (exact
  // copies of every 5th vector, +0.25-shifted copies of every 7th)
  // classified against the full corpus on its IVF cells; incoming x
  // corpus cell-mates is the ONLY pair join (the D8 ingest contract in
  // embedding space).
  def qDedupSemanticInc(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val vd = col("embedding").cast("array<double>")
    val incoming = e.filter(col("vec_id") % 5 === 0)
        .select((col("vec_id") + 10000L).as("vec_id"), vd.as("embedding"))
      .union(e.filter(col("vec_id") % 7 === 3)
        .select((col("vec_id") + 20000L).as("vec_id"),
          transform(vd, x => x + lit(0.25)).as("embedding")))
    SemDedup.semDedupIncremental(e, incoming, "vec_id", "embedding",
        nlist = 16, tau = 0.3)
      .orderBy("vec_id")
  }

  // C9: semantic decontamination — train vectors (vec_id % 10 != 7)
  // flagged when any eval vector (vec_id % 10 == 7) is within
  // cosine >= 0.3; eval-side IVF cells (nlist=8) + 2-probe routing.
  def qDecontaminateSem(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    SemDedup.scrubSemantic(
        e.filter(col("vec_id") % 10 =!= 7),
        e.filter(col("vec_id") % 10 === 7),
        "vec_id", "embedding", nlist = 8, tau = 0.3, nprobe = 2)
      .orderBy("vec_id")
  }

  // P14: DSIR-style importance selection — hashed unigram+bigram
  // log-likelihood ratio of a 4-source target slice against the raw
  // corpus, 256 buckets, top 25% selected. The integer-micro ladder
  // makes every score an order-free exact sum.
  def qDsirSelect(s: SparkSession, dir: String): DataFrame =
    Dsir.select(t(s, dir, "documents"), "doc_id", "text",
        col("source").isin("src0", "src1", "src2", "src3"),
        nBuckets = 256, selectPermille = 250)
      .orderBy("doc_id")

  // E4: fixed-point Lloyd k-means over embeddings — k=8, 3 exact
  // integer rounds, deterministic lowest-id seeding; the whole fit
  // (assignments, centroid updates, inertia) is oracle-reproducible.
  def qKmeans(s: SparkSession, dir: String): DataFrame =
    graft.operators.KMeansFixed.summary(
        graft.operators.KMeansFixed.fit(t(s, dir, "embeddings"),
          "vec_id", "embedding", k = 8, iters = 3))
      .orderBy("cell", "dim")

  // S10: hybrid retrieval — reciprocal-rank fusion of the LSH arm
  // (S2) and the IVF arm (S3) at k=5, c=60.
  def qAnnRrf(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") < 10)
    val lsh = Similarity.lshTopK(e, q, "vec_id", "embedding", 5, 8, 64)
    val ivf = IvfIndex.search(
      IvfIndex.buildDeterministic(e, "vec_id", "embedding", nlist = 16),
      q, "vec_id", "embedding", k = 5, nprobe = 4)
    graft.operators.RankFusion.rrf(Seq(lsh, ivf), "query_id",
        "neighbor_id", "rnk", k = 5)
      .withColumnRenamed("query", "query_id")
      .withColumnRenamed("item", "neighbor_id")
      .orderBy("query_id", "rnk")
  }

  // S1: brute-force cosine top-5 for queries vec_id < 10.
  def qAnnTopk(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Similarity.bruteTopK(e, e.filter(col("vec_id") < 10), "vec_id",
        "embedding", 5)
      .orderBy("query_id", "rnk")
  }

  // S2: LSH-bucketed ANN (8 sign-projection planes). Fully
  // deterministic (md5-derived hyperplanes), so oracle-checked
  // end-to-end: bucket assignment, probe, and re-rank.
  def qAnnLsh(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Similarity.lshTopK(e, e.filter(col("vec_id") < 10), "vec_id",
        "embedding", 5, 8, 64)
      .orderBy("query_id", "rnk")
  }

  // S3: IVF ANN — deterministic sampled-centroid build (the variant an
  // external engine can reproduce; the k-means build is exercised in
  // the ScalaTest suite), nprobe-cell search, oracle-checked
  // end-to-end.
  def qAnnIvf(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val index = IvfIndex.buildDeterministic(e, "vec_id", "embedding", nlist = 16)
    IvfIndex.search(index, e.filter(col("vec_id") < 10), "vec_id",
        "embedding", k = 5, nprobe = 4)
      .orderBy("query_id", "rnk")
  }

  // S8: the STREAMING ANN serving kernel (StreamingAnn.search —
  // posting-list joins + in-row scoring/ranking, zero streaming
  // state) run here on a batch frame, gated against the IDENTICAL
  // oracle SQL as q_ann_ivf: same cells probed, same sequential-fold
  // cosines, same ranking — proving the serving path selects
  // element-for-element what the batch search selects (the same
  // device as q_baseline_p95_rs / q_mad_anomaly_rs).
  def qAnnStreamTopk(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val index = IvfIndex.buildDeterministic(e, "vec_id", "embedding", nlist = 16)
    // r17 opt: materialize the posting lists ONCE — the serving kernel
    // probes them once per probe slot (4 broadcast joins), and the
    // inline-build overload re-ran the cell-assignment + collect_list
    // pipeline for every slot (aliased projections defeat exchange
    // reuse). This is exactly the "persist for serving" note on
    // StreamingAnn.postings, applied to the batch gate.
    val postings = Materializer.of(s)(
      graft.streaming.StreamingAnn.postings(index))
    graft.streaming.StreamingAnn.search(e.filter(col("vec_id") < 10),
        index, postings, "vec_id", "embedding", k = 5, nprobe = 4)
      .orderBy("query_id", "rnk")
  }

  // S5: multi-probe LSH ANN — same 8-plane index as S2, but each
  // query probes the 2^3 = 8 sign perturbations of its 3
  // least-confident planes. The probe set derives deterministically
  // from the same sequential-fold dots, so the oracle reproduces it
  // bit-for-bit.
  def qAnnLshMp(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Similarity.lshTopKMultiProbe(e, e.filter(col("vec_id") < 10), "vec_id",
        "embedding", 5, 8, 64, nFlip = 3)
      .orderBy("query_id", "rnk")
  }

  // S7: multi-table LSH ANN — 3 independent 6-plane tables (64
  // buckets each); a query probes its own bucket in every table and
  // the candidate union is deduped before ranking. Salted md5 plane
  // generators keep every table deterministic, so the oracle
  // reproduces index, probe set, and rank bit-for-bit.
  def qAnnLshMt(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Similarity.lshTopKMultiTable(e, e.filter(col("vec_id") < 10), "vec_id",
        "embedding", 5, 6, 64, nTables = 3)
      .orderBy("query_id", "rnk")
  }

  // S4: the ANN quality gate — recall@5 of the LSH (S2), multi-probe
  // LSH (S5), and IVF (S3) searches against the brute-force (S1)
  // ground truth, per query, on the SAME deterministic builds the
  // gated queries run. This is the surface a 100 TB deployment
  // actually tunes (planes/probes/nlist/nprobe against recall); the
  // gate makes the trade measurable instead of asserted. The recall
  // division is one IEEE op on two small exact integers — identical
  // on both engines.
  def qAnnRecall(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val queriesDf = e.filter(col("vec_id") < 10)
    // r18 opt: ALL four arms fuse into the brute arm's cross join —
    // each approximate arm's candidate set is a row-local predicate
    // over the (query, candidate) pairs the truth arm enumerates
    // anyway, so one broadcast join + one window pass replaces the
    // four candidate towers + three left joins of the r17 shape
    // (Similarity.annRecallCandidates; per-arm slices pinned
    // row-identical to the standalone operators in SimilaritySpec).
    val hits = Similarity.annRecallCandidates(queriesDf, "vec_id",
      "embedding", k = 5, nPlanes = 8, dim = 64, nFlip = 3,
      mtPlanes = 6, mtTables = 3,
      ivf = IvfIndex.buildDeterministic(e, "vec_id", "embedding", nlist = 16),
      nprobe = 4)
    // Materialize the (10-row) scored frame before the sort: the fused
    // search runs once for the result, not a second time for the
    // range partitioner's sample pass (measured ~2x on this query).
    Materializer.of(s)(hits
      .groupBy(col("query_id"))
      .agg(
        count(lit(1)).as("n_true"),
        coalesce(sum(col("__l")), lit(0L)).as("n_lsh_hit"),
        coalesce(sum(col("__m")), lit(0L)).as("n_mp_hit"),
        coalesce(sum(col("__t")), lit(0L)).as("n_mt_hit"),
        coalesce(sum(col("__i")), lit(0L)).as("n_ivf_hit")))
      .withColumn("recall_lsh", col("n_lsh_hit") / col("n_true"))
      .withColumn("recall_mp", col("n_mp_hit") / col("n_true"))
      .withColumn("recall_mt", col("n_mt_hit") / col("n_true"))
      .withColumn("recall_ivf", col("n_ivf_hit") / col("n_true"))
      .orderBy("query_id")
  }

  // S6: the IVF tuning curve — recall@5 per (nprobe, query) for
  // nprobe in {1, 2, 4, 8} of 16 cells, against brute-force ground
  // truth on the same deterministic index. The recall gate (S4)
  // showed IVF is this corpus's ANN scale path; this query measures
  // the knob a deployment actually turns (scan fraction vs recall).
  def qAnnIvfSweep(s: SparkSession, dir: String): DataFrame = {
    val mat = Materializer.of(s)
    val e = t(s, dir, "embeddings")
    val queriesDf = e.filter(col("vec_id") < 10)
    // Brute-force truth and the index's cell assignment each feed all
    // four probe arms — materialize both once (50 rows / one-corpus
    // pass) instead of recomputing them per arm (truth was re-derived
    // 4x, the cell scan 4x, and everything once more under the sort's
    // sample pass).
    val brute = mat(Similarity.bruteTopK(e, queriesDf, "vec_id", "embedding", 5)
      .select(col("query_id"), col("neighbor_id")))
    val index0 = IvfIndex.buildDeterministic(e, "vec_id", "embedding", nlist = 16)
    val index = index0.copy(cells = mat(index0.cells))
    val probes = Seq(1, 2, 4, 8)
    // r17 opt: one fused pipeline for all four arms (ONE cell join,
    // ONE rank window) — per-arm slices are row-identical to the
    // former per-arm search() calls (see searchSweep)
    val hits = IvfIndex.searchSweep(index, queriesDf, "vec_id",
        "embedding", k = 5, probes)
      .select(col("nprobe"), col("query_id"), col("neighbor_id"),
        lit(1L).as("__hit"))
    val truth = probes.map(np => brute.withColumn("nprobe", lit(np.toLong)))
      .reduce(_ union _)
    mat(truth.join(hits, Seq("nprobe", "query_id", "neighbor_id"), "left")
      .groupBy(col("nprobe"), col("query_id"))
      .agg(count(lit(1)).as("n_true"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_hit")))
      .withColumn("recall", col("n_hit") / col("n_true"))
      .orderBy("nprobe", "query_id")
  }

  // S9: product-quantized ANN — deterministic codebook (the ksub
  // lowest-id vectors' subvectors, zero Lloyd iterations — same
  // bootstrap convention as the IVF gate), every vector compressed to
  // m=8 codes, search by asymmetric distance over the code table
  // only. Oracle-checked END-TO-END: DuckDB rebuilds the codebook,
  // re-encodes every vector, and folds the identical ADC sum
  // (list_reduce over an s-ordered list == the ascending aggregate
  // fold), so codes, estimates, and ranks all match bit-for-bit.
  def qAnnPq(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val (cb, codes) = PqIndex.buildDeterministic(e, "vec_id", "embedding",
      m = 8, ksub = 16)
    PqIndex.searchAdc(cb, codes, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", 5)
      .orderBy("query_id", "rnk")
  }

  // S9b: the IVF-PQ composition gated end-to-end — deterministic IVF
  // routing (S3's convention) over PQ codes (S9's), nprobe=4 of 16
  // cells; the oracle fuses the two proven CTE chains.
  def qAnnIvfPq(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    // r18 opt: codes derive in-row from ivf.cells' own `v` inside the
    // fused searchIvfAdc overload — the (cells ⋈ codes) corpus
    // self-join and its second corpus scan are gone (the codes frame
    // buildDeterministic returns serves the stored-table layout; the
    // codebook is all this query needs from the build)
    val (cb, _) = PqIndex.buildDeterministic(e, "vec_id", "embedding",
      m = 8, ksub = 16)
    val ivf = IvfIndex.buildDeterministic(e, "vec_id", "embedding", nlist = 16)
    PqIndex.searchIvfAdc(ivf, cb, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nprobe = 4)
      .orderBy("query_id", "rnk")
  }

  // P2: deterministic train/val/test split (80/10/10 by id hash).
  def qSplit(s: SparkSession, dir: String): DataFrame =
    Sampling.hashSplit(
        t(s, dir, "documents").select("doc_id", "lang"), "doc_id", 80, 10)
      .select("doc_id", "lang", "split")
      .orderBy("doc_id")

  // P3: stratified 10% sample — same rate per language stratum.
  def qSample(s: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedSample(
        t(s, dir, "documents").select("doc_id", "lang"), "lang", "doc_id", 100)
      .orderBy("doc_id")

  // P8: quality-weighted proportional sampling — a length-capped
  // prior (min(n_chars, 500)/500) as the weight, expected output
  // 25% of the corpus; longer documents proportionally likelier to
  // survive, capped documents at the flat maximum rate.
  def qWeightedSample(s: SparkSession, dir: String): DataFrame =
    Sampling.weightedSample(
        t(s, dir, "documents").select("doc_id", "source", "n_chars"),
        "doc_id",
        least(col("n_chars"), lit(500)).cast("double") / lit(500.0),
        targetFrac = 0.25)
      .orderBy("doc_id")

  // T14: BPE merge training — 8 merges learned from the documents
  // corpus; the oracle RE-TRAINS in SQL (8 unrolled stages of
  // pair-count -> argmax -> greedy-fold merge), so the learned merges
  // themselves are the gated artifact.
  def qBpeMerges(s: SparkSession, dir: String): DataFrame =
    Bpe.train(t(s, dir, "documents").select("text"), "text", merges = 8)
      .orderBy("iter")

  // T14b: the segmented vocabulary those merges produce — the
  // serving-time tokenizer table itself, hash-checked word-for-word
  // against the oracle's re-trained w8 state.
  def qBpeSegment(s: SparkSession, dir: String): DataFrame =
    Bpe.trainWithVocab(t(s, dir, "documents").select("text"), "text",
        merges = 8)._2
      .orderBy("word")

  // P9: exact-n quota sampling — 40 docs per source by deterministic
  // hash order; under-filled sources keep everything.
  def qQuotaSample(s: SparkSession, dir: String): DataFrame =
    Sampling.quotaSample(
        t(s, dir, "documents").select("doc_id", "source"),
        "source", "doc_id", 40)
      .orderBy("doc_id")

  // P9 on the RankSelect bucket device (VERDICT r9 #7): the giant-
  // stratum arm must reproduce the window form's kept set EXACTLY, so
  // it gates against the IDENTICAL oracle SQL as q_quota_sample.
  def qQuotaSampleRs(s: SparkSession, dir: String): DataFrame =
    Sampling.quotaSampleRankSelect(
        t(s, dir, "documents").select("doc_id", "source"),
        "source", "doc_id", 40)
      .orderBy("doc_id")

  // C2: distribution-drift KS — the corpus is split into two synthetic
  // snapshots by event-id parity (deterministic, roughly equal halves
  // with the same distribution, so the gate exercises the full ladder
  // merge at near-zero true drift) and the exact integer KS statistic
  // is compared per event_type.
  def qDriftKs(s: SparkSession, dir: String): DataFrame =
    Drift.ksStatisticSplit(
        t(s, dir, "events").select(col("event_type"), col("event_id"),
          col("value")),
        col("event_id") % 2 === 0, "event_type", "value")
      .orderBy("event_type")

  // C2b: binned KS — the bounded-ladder variant a stream can maintain
  // (nBins rows per group forever); all-integer like C2.
  def qDriftKsBinned(s: SparkSession, dir: String): DataFrame =
    Drift.ksBinnedSplit(
        t(s, dir, "events").select(col("event_type"), col("event_id"),
          col("value")),
        col("event_id") % 2 === 0, "event_type", "value", nBins = 10)
      .orderBy("event_type")

  // C3: distribution-drift PSI over 10 reference-range bins, same
  // parity split; per-bin counts integer-exact, the PSI value itself
  // round-6 (documented ln discipline in Drift.psi).
  def qDriftPsi(s: SparkSession, dir: String): DataFrame =
    Drift.psiSplit(
        t(s, dir, "events").select(col("event_type"), col("event_id"),
          col("value")),
        col("event_id") % 2 === 0, "event_type", "value", nBins = 10)
      .orderBy("event_type", "bin")

  // P7: corpus snapshot diff — the next pipeline run is synthesized
  // from the corpus (drop %7==0, rewrite %7==1, add %7==2 under new
  // ids) and the diff must classify every id exactly.
  def qSnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val next = docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 1, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
      .union(docs.filter(col("doc_id") % 7 === 2)
        .select((col("doc_id") + 5000000L).as("doc_id"), col("text")))
    Snapshot.diff(docs, next, "doc_id", "text").orderBy("doc_id")
  }

  // T9: text normalization. The corpus is already clean, so the query
  // plants deterministic mess per doc — uppercase, tab, control char,
  // NBSP, em/en dashes — and the operator must produce the canonical
  // form; lengths and hash make the whole normalized string gate-checked.
  def qNormalize(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"),
        concat(lit("  NOISY\t—Block "),
          (col("doc_id") % 7).cast("string"),
          lit("–END  "), col("text")).as("raw"))
      .select(col("doc_id"),
        length(col("raw")).cast("long").as("raw_len"),
        TextAnalysis.normalize(col("raw")).as("__norm"))
      .select(col("doc_id"), col("raw_len"),
        length(col("__norm")).cast("long").as("norm_len"),
        md5(col("__norm")).as("norm_hash"))
      .orderBy("doc_id")

  // T10: frequency vocabulary build over the corpus (token_id ranked
  // by count desc, token asc; histogram-offset rank — no global sort).
  def qVocab(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabulary(t(s, dir, "documents"), "text", minCount = 2)
      .orderBy("token_id")

  // T12: C4-style line-level dedup. The corpus is single-line, so the
  // query plants deterministic multi-line docs (same device as
  // qPiiScrub/qNormalize): two boilerplate lines shared by every doc,
  // one shared by each doc_id%7 cohort, and the doc's own text. The
  // operator must drop exactly the shared lines (including text lines
  // duplicated across docs — the corpus has exact dups) and reassemble
  // the rest in order.
  def qLineDedup(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.lineDedup(
        t(s, dir, "documents").select(col("doc_id"),
          concat_ws("\n",
            lit("home | about | contact"),
            concat(lit("section "), (col("doc_id") % 7).cast("string")),
            col("text"),
            lit("copyright 2026 example.org")).as("text")),
        "doc_id", "text", minDocs = 2)
      .orderBy("doc_id")

  // T13: bigram-LM quality scoring, model fit on the corpus itself
  // (every bigram seen -> n_oov = 0; the score separates repetitive
  // from varied docs exactly as the CCNet perplexity cut does).
  def qLmScore(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    TextAnalysis.bigramLmScore(docs, docs, "doc_id", "text")
      .orderBy("doc_id")
  }

  // T11: TF-IDF term relevance per (doc, term); membership decided by
  // integer tf/df thresholds, floats only in the output cells (idf
  // rounded to 6 before the multiply — see TextAnalysis.tfidf).
  def qTfidf(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfidf(t(s, dir, "documents"), "doc_id", "text",
        minTf = 2, minDf = 2)
      .orderBy("doc_id", "token")

  // T18: collocation lift for adjacent token pairs seen >= 5 times —
  // exact decimal products, one IEEE division, no ln (monotone, so
  // any PMI threshold is a lift threshold).
  def qCollocations(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.collocations(t(s, dir, "documents"), "text",
        minPairCount = 5L)
      .orderBy("tok_a", "tok_b")

  // T19: token-distribution entropy per source — the mix-diversity
  // panel read before source weighting (low entropy = template spam).
  def qEntropy(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenEntropy(t(s, dir, "documents"), "source", "text")
      .withColumnRenamed("grp", "source")
      .orderBy("source")

  // T21: Flesch-form readability per document — one row-local regex
  // count per component, one fixed IEEE expression, no transcendentals.
  def qReadability(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.readability(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  // P6: deterministic corpus shuffle — the training-order permutation,
  // reproducible from (salt, id) alone; rank assembled from the
  // 256-bucket offset + per-bucket row_number (no one-task sort).
  def qShuffle(s: SparkSession, dir: String): DataFrame =
    Sampling.deterministicShuffle(
        t(s, dir, "documents").select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("lang"), col("shuffle_rank"))
      .orderBy("shuffle_rank")

  // C1: train/test 5-gram contamination over the hash split — the
  // decontamination audit a benchmark split goes through before its
  // numbers are trusted.
  def qContamination(s: SparkSession, dir: String): DataFrame =
    Contamination.ngramOverlap(
        Sampling.hashSplit(t(s, dir, "documents").select("doc_id", "text"),
          "doc_id", 80, 10),
        "doc_id", "text", "split", n = 5)
      .orderBy("doc_id")

  // C1b: the C1 audit's per-eval-suite attribution — same hash split,
  // same train index and eval-blocked join, rolled up by the test
  // doc's crawl source standing in as the eval suite: per suite, docs
  // audited / docs over threshold / gram totals / pooled overlap.
  def qContaminationBy(s: SparkSession, dir: String): DataFrame =
    Contamination.ngramOverlapBy(
        Sampling.hashSplit(
          t(s, dir, "documents").select("doc_id", "text", "source"),
          "doc_id", 80, 10),
        "doc_id", "text", "split", "source", n = 5)
      .orderBy("suite")

  // T16: BM25 over a fixed 3-term query (one zero-df term pins the
  // degenerate idf path); top 50 by (score, doc_id).
  def qBm25(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bm25(t(s, dir, "documents"), "doc_id", "text",
      terms = Seq("merge", "quantum", "spark"), topK = 50)

  // P13: write the corpus partitioned by source (bounded files), read
  // the artifact back, manifest it — the oracle manifests the SOURCE
  // table directly, so any loss/duplication/mangling in the
  // write-read roundtrip breaks the gate.
  //
  // Gate scope: 4 of the 20 sources, maxRecordsPerFile=10. The tiny
  // file size is the POINT of the gate (it forces multi-file
  // partitions and cross-file reassembly at every sf — 3 files/source
  // at sf0.01); the source subset keeps the gate's real write+read I/O
  // from reading as a 5.5 s *operator cost* in the bench (it is a
  // file-count artifact, not plan work — ProbeReleaseThroughput
  // measures the production-file-size write rate over the FULL corpus
  // separately, SURVEY §22).
  def qReleaseManifest(s: SparkSession, dir: String): DataFrame = {
    // per-APPLICATION scratch path + overwrite mode: repeated
    // invocations inside one session reuse (not accumulate) the dir,
    // while two concurrent gate/bench runs on the same box get
    // disjoint paths instead of clobbering each other mid write/read;
    // the shutdown hook deletes the scratch copy when the JVM exits
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_release_gate_" +
      s.sparkContext.applicationId
    Release.deleteOnExit(tmp)
    val slice = t(s, dir, "documents")
      .filter(col("source").isin("src0", "src1", "src2", "src3"))
    // r17 opt (guide §6, output file sizing): the fixed
    // maxRecordsPerFile=10 made the artifact's FILE COUNT linear in
    // the corpus (100 tiny files at sf0.1 — write, list, open, and
    // delete-on-overwrite costs all per-file). Derive the cap from the
    // slice size so the gate keeps its multi-file/cross-file-
    // reassembly point (~5 files per source) with an O(1) file count;
    // the floor of 10 keeps the written layout IDENTICAL to previous
    // rounds at the sf0.01/sf0.001 gate scales. The manifest carries
    // no file-level fact, so the query's RESULT is invariant — the
    // count() is one map-side-combinable scan of a 4-source slice.
    val nRows = slice.count()
    Release.writeAndManifest(slice, tmp, "source", "doc_id", "text",
        maxRecordsPerFile = math.max(10L, nRows / 20L))
      .orderBy("source")
  }

  // T17: character/encoding sanity profile per document.
  def qCharSanity(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.charSanity(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  // C5: QI = (nation, market segment); sensitive = acctbal
  // thousand-band. k=10 leaves a mix of safe and at-risk groups at
  // every gate scale.
  def qKAnonymity(s: SparkSession, dir: String): DataFrame =
    Privacy.kAnonymity(t(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"),
        expr("cast(floor(c_acctbal / 1000) as bigint)"), k = 10L)
      .orderBy("c_nationkey", "c_mktsegment")

  // P12: 3-gram shingle Jaccard between every source pair.
  def qSourceOverlap(s: SparkSession, dir: String): DataFrame =
    Overlap.sourceOverlap(t(s, dir, "documents"), "source", "text", n = 3)
      .orderBy("src_a", "src_b")

  // C6: language-mix stability per source between two deterministic
  // hash halves of the corpus (the categorical leg of the drift
  // battery). The hash split, not id parity: doc ids are assigned to
  // sources round-robin, so parity is perfectly correlated with
  // source and one side would be empty.
  def qDriftChi2(s: SparkSession, dir: String): DataFrame =
    Drift.chiSquareSplit(t(s, dir, "documents"),
        Sampling.bucketOf(col("doc_id"), "chi2", 2) === 0,
        "source", "lang", alpha = 0.5)
      .orderBy("source", "category")

  // E3: the PCA moment matrix — the ONE corpus-touching aggregation
  // behind Pca.topComponent (the driver's 30-step power iteration is
  // spec-covered; this gates the distributed arithmetic). Runs the
  // production MATRIX-AGGREGATE path (PcaSpec pins it bit-equal to
  // the independently-derived explode formulation).
  def qPcaMoments(s: SparkSession, dir: String): DataFrame =
    Pca.momentsViaAgg(t(s, dir, "embeddings"), "embedding", dim = 64)
      .orderBy("i", "j")

  // E3b: one moment matrix per label in the same pass.
  def qPcaMomentsBy(s: SparkSession, dir: String): DataFrame =
    Pca.momentsViaAggBy(t(s, dir, "embeddings"), "embedding", dim = 64,
        groupCol = "label")
      .orderBy("label", "i", "j")

  // E1: int8 symmetric quantization report per embedding vector.
  def qEmbedQuant(s: SparkSession, dir: String): DataFrame =
    Quantization.int8Report(t(s, dir, "embeddings"), "vec_id", "embedding")
      .orderBy("vec_id")

  // E2: embedding cartography — per-label centroid + compactness
  // (exact-decimal centroid, sequential-fold cosines).
  def qEmbedCartography(s: SparkSession, dir: String): DataFrame =
    graft.operators.Cartography
      .centroidStats(t(s, dir, "embeddings"), "vec_id", "embedding", "label")
      .withColumnRenamed("grp", "label")
      .orderBy("label")

  // P4: concat-and-chunk sequence packing, 128-token blocks per source
  // shard.
  def qSeqPack(s: SparkSession, dir: String): DataFrame =
    Packing.concatChunk(t(s, dir, "documents"), "doc_id", "text", "source", 128L)
      .orderBy("doc_id")

  // A25: the z-order expression end-to-end — Morton value of
  // (doc_id%256, n_chars%256) per doc; the oracle rebuilds the bit
  // interleave arithmetically, so the codegen'd kernel is oracle-gated
  // (the layout/pruning effect is asserted in ZOrderWriteSpec).
  def qZorder(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.ZOrder.z2(
          (col("doc_id") % 256L).cast("long"),
          (col("n_chars") % 256L).cast("long")).as("z"))
      .orderBy("doc_id")

  /** Source-mix literals shared by the Spark query and its oracle —
    * boost three sources, spread the rest; the same Scala doubles are
    * printed into the SQL so both engines multiply identical values.
    */
  val MixShares: Seq[(String, Double)] =
    Seq("src0" -> 0.3, "src1" -> 0.2, "src2" -> 0.1)
  val MixDefaultShare: Double = 0.4 / 17.0
  val MixTotalFrac: Double = 0.5

  // P5: deterministic source mixing toward target shares.
  def qSourceMix(s: SparkSession, dir: String): DataFrame =
    Sampling.mixSample(t(s, dir, "documents").select("doc_id", "source"),
        "doc_id", "source", MixShares, MixDefaultShare, MixTotalFrac)
      .orderBy("doc_id")

  /** P10 gate params: 40-token windows advancing by 30 (25% overlap). */
  val ChunkWindow = 40
  val ChunkStride = 30

  // P10: token-window chunking over the corpus.
  def qChunk(s: SparkSession, dir: String): DataFrame =
    Packing.chunk(t(s, dir, "documents"), "doc_id", "text",
        ChunkWindow, ChunkStride)
      .orderBy("doc_id", "chunk_id")

  /** P5b gate param: keep ~35% of the corpus, temperature-flattened. */
  val TmixTotalFrac = 0.35

  // P5b: temperature-flattened mixing — kept rows, deterministically.
  def qMixTemperature(s: SparkSession, dir: String): DataFrame =
    Sampling.temperatureMix(
        t(s, dir, "documents").select("doc_id", "source"),
        "doc_id", "source", TmixTotalFrac)
      .orderBy("doc_id")

  // T15: HTML -> text extraction over synthesized crawl shells (head/
  // script/style blocks, entities, raw < and && inside script); gated
  // against the CLOSED-FORM ground truth, not regex parity.
  def qHtmlExtract(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.htmlExtract(
        TextAnalysis.synthesizeHtml(t(s, dir, "documents"), "doc_id", "text"),
        "doc_id", "html")
      .select(col("doc_id"), col("n_chars"), md5(col("text")).as("text_md5"))
      .orderBy("doc_id")

  // P11: dataset card — the per-(source, lang) corpus report a data
  // release ships: doc/token volumes plus exact order statistics
  // (lower-median quality, p90 length) selected by integer rank with
  // id tie-breaks, so the card is reproducible to the last digit.
  // One window pass + one aggregation; composes T1's quality kernel.
  def qCorpusCard(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
    val stats = TextAnalysis.textStats(
        docs.select("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "n_tokens", "quality")
    val full = stats.join(docs.select("doc_id", "source", "lang"), "doc_id")
    val grp = Seq(col("source"), col("lang"))
    val wq = Window.partitionBy(grp: _*).orderBy(col("quality"), col("doc_id"))
    val wt = Window.partitionBy(grp: _*).orderBy(col("n_tokens"), col("doc_id"))
    full
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy(grp: _*)))
      .withColumn("__rq", row_number().over(wq))
      .withColumn("__rt", row_number().over(wt))
      .groupBy("source", "lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        min(when(col("__rq") * 2 >= col("__cnt"), col("quality")))
          .as("med_quality"),
        min(when(col("__rt") * 10 >= col("__cnt") * 9, col("n_tokens")))
          .as("p90_tokens"))
      .orderBy("source", "lang")
  }

  // T1: per-document quality stats.
  def qTextStats(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.textStats(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  // T2: marker-voting language ID.
  def qLangid(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.langId(t(s, dir, "documents"), "doc_id", "text", "lang")
      .orderBy("doc_id")

  // T3: token counting per source.
  def qTokenCount(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenCounts(t(s, dir, "documents"), "source", "text")
      .orderBy("source")

  // T4: positional rolling-hash fingerprints.
  def qFingerprint(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprint(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  // T5: intra-document repetition metrics (Gopher-style filters).
  def qRepetition(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetition(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  // T6: PII detection + redaction. The corpus is synthetic-clean, so
  // the query plants deterministic PII (derived from doc_id) and the
  // operator must find and scrub exactly that.
  def qPiiScrub(s: SparkSession, dir: String): DataFrame = {
    val injected = t(s, dir, "documents").select(col("doc_id"),
      concat(col("text"),
        lit(" contact user"), (col("doc_id") % 50).cast("string"),
        lit("@mail"), (col("doc_id") % 7).cast("string"),
        lit(".example.com from 10."),
        (col("doc_id") % 200).cast("string"), lit(".3."),
        (col("doc_id") % 100).cast("string"),
        lit(" ref "), (lit(7000000L) + col("doc_id") * 37L).cast("string"))
        .as("text"))
    TextAnalysis.piiScrub(injected, "doc_id", "text")
      .drop("redacted")
      .orderBy("doc_id")
  }

  // T8: hash-linear classifier scoring — model-based filtering
  // plumbing with a deterministic stand-in weight table. The gated run
  // hashes with md5 (oracle parity); SPARK_GRAFT_FAST_HASH=1 swaps in
  // the xxhash64 production path, same as the dedup queries.
  def qLinearScore(s: SparkSession, dir: String): DataFrame = {
    val h: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      if (sys.env.get("SPARK_GRAFT_FAST_HASH").contains("1")) Hashing.xx60
      else Hashing.md5Long60
    TextAnalysis.linearScore(t(s, dir, "documents"), "doc_id", "text", 0.0, h)
      .orderBy("doc_id")
  }

  /** Blocklist shared by the T7 query and its oracle. */
  val BlockedDomains: Seq[String] = Seq("site3.example", "assets7.net")

  // T7: URL/domain analysis under the FULL bundled Public Suffix List
  // (~9.5k rules). The corpus has no URLs, so the query plants six per
  // document (derived from doc_id): a default-rule domain, a blocked
  // .net domain, a co.uk exact-rule domain, a *.ck wildcard-rule host,
  // a *.kawasaki.jp multi-label-wildcard host deep enough that the
  // registrable domain is a PROPER suffix, and an !www.ck
  // exception-rule host — every PSL rule kind is gate-checked.
  def qUrlDomains(s: SparkSession, dir: String): DataFrame = {
    val injected = t(s, dir, "documents").select(col("doc_id"),
      concat(col("text"),
        lit(" see https://w"), (col("doc_id") % 7).cast("string"),
        lit(".site"), (col("doc_id") % 23).cast("string"),
        lit(".example/page"),
        lit(" and http://cdn"), (col("doc_id") % 5).cast("string"),
        lit(".assets"), (col("doc_id") % 11).cast("string"),
        lit(".net/x"),
        lit(" or https://shop"), (col("doc_id") % 13).cast("string"),
        lit(".co.uk/p"),
        lit(" plus https://alpha"), (col("doc_id") % 9).cast("string"),
        lit(".beta"), (col("doc_id") % 11).cast("string"),
        lit(".ck/z"),
        lit(" deep https://w"), (col("doc_id") % 3).cast("string"),
        lit(".v"), (col("doc_id") % 4).cast("string"),
        lit(".shop"), (col("doc_id") % 5).cast("string"),
        lit(".kawasaki.jp/x"),
        lit(" img https://img"), (col("doc_id") % 7).cast("string"),
        lit(".www.ck/i"),
        // host EQUAL to a multi-label wildcard base: *.kawasaki.jp does
        // NOT match (no label over the base) — resolves via the default
        // rule to itself, not dropped
        lit(" bare https://kawasaki.jp/q")).as("text"))
    TextAnalysis.urlDomainsPsl(injected, "doc_id", "text", BlockedDomains)
      .orderBy("domain")
  }

  // A16: per-language token heavy hitters via the custom Misra-Gries
  // TypedImperativeAggregate. k=64 exceeds every group's distinct
  // token count (31), so the sketch is exact here and the oracle can
  // check it; under-k domains are where MG guarantees exactness.
  def qHeavyHitters(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy(col("lang"))
      .agg(HeavyHitters.heavyHitters(col("tok"), 64).as("hh"))
      .select(col("lang"), posexplode(col("hh")).as(Seq("pos", "e")))
      .select(col("lang"), col("pos"),
        col("e.item").as("item"), col("e.count").as("n"))
      .orderBy("lang", "pos")

  // M1: multimodal metadata extraction over a binary media column —
  // REAL ImageIO decode of a mixed PNG/GIF corpus synthesized
  // deterministically from doc_id (the oracle reproduces the decoded
  // stats from the closed-form synthesis parameters; the decoded
  // payload size is real but encoder-dependent, so it stays out of the
  // gated projection and is asserted > 0 in MultimodalSpec).
  // Same device as qMmAudio: the sort's sample pass must not re-run
  // the synth+decode chain — materialize the small decoded frame first.
  def qMmMeta(s: SparkSession, dir: String): DataFrame =
    Materializer.of(s)(
      Multimodal.extractMeta(
          Multimodal.synthesizeCorpus(t(s, dir, "documents"), "doc_id"),
          "doc_id", "media")
        .select(col("doc_id"), col("magic"), col("width"), col("height"),
          col("n_frames"), col("mean_px")))
      .orderBy("doc_id")

  // M2: 1:N frame sampling — REAL multi-frame GIF decode (1..4 frames
  // per doc), one row per decoded frame with exact pixel statistics.
  def qMmFrames(s: SparkSession, dir: String): DataFrame =
    Materializer.of(s)(
      Multimodal.sampleFrames(
          Multimodal.synthesizeCorpus(t(s, dir, "documents"), "doc_id",
            gifOnly = true),
          "doc_id", "media"))
      .orderBy("doc_id", "frame_idx")

  // M4: REAL audio decode — mono 16-bit PCM WAV payloads synthesized
  // from a closed-form ramp, decoded with javax.sound.sampled; format
  // fields, duration, peak, and RMS energy all come from the decoded
  // samples, and the oracle recomputes them from the synthesis formula
  // (sample sums/squares are exact integers; duration and rms are one
  // IEEE division / correctly-rounded sqrt each).
  // The trailing orderBy's range partitioner runs a SAMPLE pass that
  // would re-execute the whole synth+decode chain (measured at ~4x the
  // codec cost at sf0.1) — materialize the small decoded frame first so
  // the sort (and any downstream consumer) reads rows, not the codec.
  def qMmAudio(s: SparkSession, dir: String): DataFrame =
    Materializer.of(s)(
      Multimodal.extractAudioMeta(
        Multimodal.synthesizeAudioCorpus(t(s, dir, "documents"), "doc_id"),
        "doc_id", "media"))
      .orderBy("doc_id")

  // M3: REAL resize, verified end-to-end — synthesize, resize to a
  // 64px long side (aspect preserved, never upscaled), then DECODE THE
  // RESIZED PAYLOAD and read its dimensions back out of the re-encoded
  // PNG. The oracle recomputes the dims from the synthesis params and
  // the documented scale rule (floor(x+0.5) mirrors Java math.round;
  // the scale double is the identical IEEE quotient on both engines).
  // Pixel CONTENT after Graphics2D interpolation is encoder-defined and
  // stays out of the gated projection (MultimodalSpec covers it).
  def qMmResize(s: SparkSession, dir: String): DataFrame =
    Materializer.of(s)(
      Multimodal.extractMeta(
        Multimodal.resize(
            Multimodal.synthesizeCorpus(t(s, dir, "documents"), "doc_id"),
            "doc_id", "media", maxSide = 64)
          .select(col("doc_id"), col("resized")),
        "doc_id", "resized"))
      .select(col("doc_id"), col("magic").as("out_magic"),
        col("width").as("out_width"), col("height").as("out_height"))
      .orderBy("doc_id")

  // M5: perceptual fingerprint (60-bit row-gradient dHash + 4-bin
  // luminance histogram) from REAL decoded rasters (PNG and
  // palette-resolved GIF both); the oracle recomputes every bit and
  // bin from the closed-form synthesis ramp.
  def qMmPhash(s: SparkSession, dir: String): DataFrame =
    Materializer.of(s)(
      Multimodal.perceptualHash(
        Multimodal.synthesizeCorpus(t(s, dir, "documents"), "doc_id"),
        "doc_id", "media"))
      .orderBy("doc_id")

  // M5 -> D4 composition: image near-dup end to end — REAL decoded
  // rasters -> 60-bit dHash -> 3x20-bit band join -> exact Hamming
  // verify. nBands (3) > maxHamming (2) makes the banding EXACT by
  // pigeonhole, so the oracle can brute-force ALL pairs from the
  // closed-form synthesis ramp and the sets must match bit for bit.
  def qMmNeardup(s: SparkSession, dir: String): DataFrame =
    Multimodal.imageNearDup(
      Multimodal.synthesizeCorpus(t(s, dir, "documents"), "doc_id"),
      "doc_id", "media", maxHamming = 2, nBands = 3)
      .orderBy("doc_a", "doc_b")

  // M8 -> D4 composition: audio near-dup end to end — REAL decoded PCM
  // -> 60-bit energy-delta fingerprint -> 3x20-bit band join -> exact
  // Hamming verify. nBands (3) > maxHamming (2) makes the banding
  // EXACT by pigeonhole, so the oracle brute-forces ALL pairs from the
  // closed-form sample ramp and the sets must match bit for bit.
  def qMmAudioNearDup(s: SparkSession, dir: String): DataFrame =
    Multimodal.audioNearDup(
      Multimodal.synthesizeAudioCorpus(t(s, dir, "documents"), "doc_id"),
      "doc_id", "media", maxHamming = 2, nBands = 3)
      .orderBy("doc_a", "doc_b")

  // M9: the M8 pair set resolved to CLUSTER LABELS through the generic
  // D6 star-contraction connected components — media dedup pipelines
  // act on cluster representatives, not raw pair lists. Same composition
  // discipline as M7->M8: one generic pair machine, one generic
  // components machine, per-modality fingerprints.
  def qMmAudioClusters(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"))
    Dedup.clusters(docs, "doc_id",
      Multimodal.audioNearDup(
        Multimodal.synthesizeAudioCorpus(docs, "doc_id"),
        "doc_id", "media", maxHamming = 2, nBands = 3),
      pairsCanonical = true)
      .orderBy("doc_id")
  }

  // M10: canonical-survivor selection for audio near-dup — the D11
  // keep/drop discipline on media clusters at the near-exact tier
  // (Hamming <= 1): ONE real-decode fingerprint pass feeds the band
  // join AND the quality column (longest clip wins, ties to the
  // smallest id — n_samples comes from the decoded stream, not the
  // synthesis closed form).
  def qMmAudioKeep(s: SparkSession, dir: String): DataFrame = {
    val fp = Materializer.of(s)(Multimodal.audioFingerprint(
      Multimodal.synthesizeAudioCorpus(
        t(s, dir, "documents").select(col("doc_id")), "doc_id"),
      "doc_id", "media"))
    val pairs = Dedup.bandedHammingPairs(fp, "doc_id", "afp",
      totalBits = 60, nBands = 3, maxHamming = 1)
    Dedup.keepCanonical(fp, "doc_id", col("n_samples"), pairs,
        pairsCanonical = true)
      .orderBy("doc_id")
  }

  // C4: per-doc 3-gram novelty vs a reference slice (doc_id % 7 == 0
  // stands in for "the training set so far"); scored docs are the rest.
  def qNovelty(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
    graft.operators.Contamination.noveltyVsReference(
        d.filter(col("doc_id") % 7 =!= 0), d.filter(col("doc_id") % 7 === 0),
        "doc_id", "text", 3, tokenHash)
      .orderBy("doc_id")
  }

  // M6: REAL zero-crossing extraction from decoded PCM samples; the
  // oracle recomputes count and rate from the synthesis ramp.
  def qMmZcr(s: SparkSession, dir: String): DataFrame =
    Materializer.of(s)(
      Multimodal.extractAudioZcr(
        Multimodal.synthesizeAudioCorpus(t(s, dir, "documents"), "doc_id"),
        "doc_id", "media"))
      .orderBy("doc_id")

  // T20: BIGRAM vocabulary growth per 25-doc bucket in doc-id order
  // (the unigram vocabulary of the synthetic corpus saturates in the
  // first bucket; the phrase vocabulary keeps growing).
  def qVocabGrowth(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabGrowth(t(s, dir, "documents"), "doc_id", "text",
        25L, n = 2)
      .orderBy("bucket")

  // P1: composite curation pipeline — dedup the (duplicated) corpus,
  // score quality, keep docs passing the bar, roll up per language.
  // The shape a real training-data job takes; one declarative plan.
  def qPipeline(s: SparkSession, dir: String): DataFrame = {
    val kept = Dedup.exact(dupCorpus(s, dir), "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val docs = t(s, dir, "documents").join(kept, "doc_id")
    val stats = TextAnalysis.textStats(
      docs.select("doc_id", "text"), "doc_id", "text")
    stats
      .join(t(s, dir, "documents").select("doc_id", "lang"), "doc_id")
      .filter(col("quality") >= 0.5 && col("n_tokens") >= 20)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(sum(col("quality").cast("decimal(10,4)")), 2)
          .cast("double").as("sum_quality"),
        sum(col("n_tokens")).as("sum_tokens"))
      .orderBy("lang")
  }

  /** ER demo sides — two genuinely different tables carved from the
    * corpus: left keeps even doc ids verbatim; right takes every third
    * doc, shifts it into a disjoint id space, and perturbs the text
    * (one appended token), so doc_id%6==0 rows have a true fuzzy match
    * across the tables and everything else only accidental overlap.
    */
  private def erSides(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
    (d.filter(col("doc_id") % 2 === 0),
      d.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 5000000L).as("doc_id"),
          concat(col("text"), lit(" zzev")).as("text")))
  }

  val ErMaxDf = 100L

  // ER1: two-table fuzzy join, 3-gram Jaccard >= 2/5, production
  // df-capped candidate path (cap counted across both sides).
  def qErPairs(s: SparkSession, dir: String): DataFrame = {
    val (l, r) = erSides(s, dir)
    graft.operators.EntityResolution
      .fuzzyJoin(l, r, "doc_id", "text", 3, 2, 5, tokenHash, maxDf = ErMaxDf)
      .orderBy("left_id", "right_id")
  }

  // ER2: one-to-one resolution of the ER1 pair set by mutual best match.
  def qErMatch(s: SparkSession, dir: String): DataFrame = {
    val (l, r) = erSides(s, dir)
    graft.operators.EntityResolution.bestMatch(
        graft.operators.EntityResolution
          .fuzzyJoin(l, r, "doc_id", "text", 3, 2, 5, tokenHash, maxDf = ErMaxDf))
      .orderBy("left_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_k_anonymity" -> qKAnonymity,
    "q_source_overlap" -> qSourceOverlap,
    "q_bm25" -> qBm25,
    "q_pca_moments" -> qPcaMoments,
    "q_pca_moments_by" -> qPcaMomentsBy,
    "q_drift_chi2" -> qDriftChi2,
    "q_char_sanity" -> qCharSanity,
    "q_release_manifest" -> qReleaseManifest,
    "q_pipeline" -> qPipeline,
    "q_er_pairs" -> qErPairs,
    "q_er_match" -> qErMatch,
    "q_chunk" -> qChunk,
    "q_mix_temperature" -> qMixTemperature,
    "q_html_extract" -> qHtmlExtract,
    "q_corpus_card" -> qCorpusCard,
    "q_novelty" -> qNovelty,
    "q_mm_zcr" -> qMmZcr,
    "q_vocab_growth" -> qVocabGrowth,
    "q_dedup_exact" -> qDedupExact,
    "q_dedup_ngram" -> qDedupNgram,
    "q_dedup_minhash" -> qDedupMinhash,
    "q_dedup_recall" -> qDedupRecall,
    "q_dedup_clusters" -> qDedupClusters,
    "q_dedup_keep" -> qDedupKeep,
    "q_expectations" -> qExpectations,
    "q_jl_distortion" -> qJlDistortion,
    "q_mrl_distortion" -> qMrlDistortion,
    "q_filter_cascade" -> qFilterCascade,
    "q_filter_marginals" -> qFilterMarginals,
    "q_hard_negatives" -> qHardNegatives,
    "q_hard_neg_sweep" -> qHardNegSweep,
    "q_dedup_incremental" -> qDedupIncremental,
    "q_dedup_simhash" -> qDedupSimhash,
    "q_simhash_recall" -> qSimhashRecall,
    "q_dup_clean" -> qDupClean,
    "q_decontaminate" -> qDecontaminate,
    "q_decontaminate_by" -> qDecontaminateBy,
    "q_split_leakage" -> qSplitLeakage,
    "q_dup_passages" -> qDupPassages,
    "q_dup_substrings" -> qDupSubstrings,
    "q_dup_substrings_by" -> qDupSubstringsBy,
    "q_dedup_embed" -> qDedupEmbed,
    "q_dedup_semantic" -> qDedupSemantic,
    "q_dedup_semantic_inc" -> qDedupSemanticInc,
    "q_decontaminate_sem" -> qDecontaminateSem,
    "q_dsir_select" -> qDsirSelect,
    "q_kmeans" -> qKmeans,
    "q_ann_rrf" -> qAnnRrf,
    "q_ann_topk" -> qAnnTopk,
    "q_ann_lsh" -> qAnnLsh,
    "q_ann_lsh_mp" -> qAnnLshMp,
    "q_ann_lsh_mt" -> qAnnLshMt,
    "q_ann_ivf" -> qAnnIvf,
    "q_ann_stream_topk" -> qAnnStreamTopk,
    "q_ann_ivf_sweep" -> qAnnIvfSweep,
    "q_ann_recall" -> qAnnRecall,
    "q_ann_pq" -> qAnnPq,
    "q_ann_ivfpq" -> qAnnIvfPq,
    "q_split" -> qSplit,
    "q_sample" -> qSample,
    "q_quota_sample" -> qQuotaSample,
    "q_quota_sample_rs" -> qQuotaSampleRs,
    "q_bpe_merges" -> qBpeMerges,
    "q_bpe_segment" -> qBpeSegment,
    "q_drift_ks" -> qDriftKs,
    "q_drift_ks_binned" -> qDriftKsBinned,
    "q_drift_psi" -> qDriftPsi,
    "q_weighted_sample" -> qWeightedSample,
    "q_shuffle" -> qShuffle,
    "q_normalize" -> qNormalize,
    "q_vocab" -> qVocab,
    "q_tfidf" -> qTfidf,
    "q_collocations" -> qCollocations,
    "q_entropy" -> qEntropy,
    "q_readability" -> qReadability,
    "q_line_dedup" -> qLineDedup,
    "q_lm_score" -> qLmScore,
    "q_snapshot_diff" -> qSnapshotDiff,
    "q_contamination" -> qContamination,
    "q_contamination_by" -> qContaminationBy,
    "q_embed_quant" -> qEmbedQuant,
    "q_embed_cartography" -> qEmbedCartography,
    "q_seq_pack" -> qSeqPack,
    "q_source_mix" -> qSourceMix,
    "q_zorder" -> qZorder,
    "q_text_stats" -> qTextStats,
    "q_langid" -> qLangid,
    "q_token_count" -> qTokenCount,
    "q_fingerprint" -> qFingerprint,
    "q_repetition" -> qRepetition,
    "q_pii_scrub" -> qPiiScrub,
    "q_url_domains" -> qUrlDomains,
    "q_linear_score" -> qLinearScore,
    "q_mm_meta" -> qMmMeta,
    "q_mm_phash" -> qMmPhash,
    "q_mm_neardup" -> qMmNeardup,
    "q_mm_aneardup" -> qMmAudioNearDup,
    "q_mm_aclusters" -> qMmAudioClusters,
    "q_mm_akeep" -> qMmAudioKeep,
    "q_mm_frames" -> qMmFrames,
    "q_mm_audio" -> qMmAudio,
    "q_mm_resize" -> qMmResize,
    "q_heavy_hitters" -> qHeavyHitters)

  // ---------------------------------------------------------------- oracle

  /** T14 oracle device: the k-stage BPE re-training CTE chain — per
    * stage a (pair-count, argmax, merged-words) triple; `word` rides
    * through so the final stage doubles as the segmented vocab.
    */
  private def bpeChainCtes(k: Int): String = {
    val init =
      """w0 AS (SELECT token AS word,
        |         trim(regexp_replace(token, '(.)', '\1 ', 'g')) AS syms,
        |         CAST(count(*) AS BIGINT) AS wc
        |       FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |             FROM documents) tk
        |       WHERE regexp_matches(token, '^[a-z]+$')
        |       GROUP BY 1, 2)""".stripMargin
    val stages = (1 to k).map { i =>
      s"""p$i AS (SELECT a[i] AS l, a[i + 1] AS r, sum(wc) AS c FROM
         |    (SELECT wc, a, unnest(generate_series(1, len(a) - 1)) AS i
         |     FROM (SELECT wc, string_split(syms, ' ') AS a FROM w${i - 1}) t0) t1
         |  GROUP BY 1, 2),
         |b$i AS (SELECT l, r, c FROM p$i ORDER BY c DESC, l, r LIMIT 1),
         |w$i AS (SELECT w.word, ${Bpe.mergeFoldSql("w.syms", "b.l", "b.r")} AS syms, w.wc
         |        FROM w${i - 1} w, b$i b)""".stripMargin
    }
    s"$init,\n${stages.mkString(",\n")}"
  }

  private val h60 = Hashing.md5Long60Sql _

  /** Shared shingle CTEs over the dup corpus (3-gram, distinct) —
    * token-hash linear combination, mirroring Dedup.shingleSets.
    */
  private val shingleCombineSql = {
    import graft.operators.Dedup.ShingleCoef
    (0 until 3).map(k => s"${ShingleCoef(k)} * th[i + $k]").mkString(" + ")
  }

  private val shingleCtes =
    s"""corpus AS ($dupCorpusSql),
       |tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM corpus),
       |th AS (SELECT doc_id, list_transform(toks, t -> ${Hashing.h30Sql("t")}) AS th
       |       FROM tok WHERE len(toks) >= 3),
       |sh AS (SELECT DISTINCT doc_id, $shingleCombineSql AS sh
       |       FROM (SELECT doc_id, th, unnest(generate_series(1, len(th) - 2)) AS i FROM th) x),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)""".stripMargin

  /** ER oracle CTE chain: both sides' shingle sets, the combined-df
    * posting cap, candidates, full recount, sizes, and the thresholded
    * pair table `erp` — mirroring EntityResolution.fuzzyJoin.
    */
  private val erCtes = {
    def sideSh(src: String, id: String) =
      s"""${id}th AS (SELECT $id, list_transform(toks, t -> ${Hashing.h30Sql("t")}) AS th
         |        FROM (SELECT $id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM $src) x0
         |        WHERE len(toks) >= 3),
         |${id}sh AS (SELECT DISTINCT $id, $shingleCombineSql AS sh
         |        FROM (SELECT $id, th, unnest(generate_series(1, len(th) - 2)) AS i FROM ${id}th) x1)""".stripMargin
    s"""lsrc AS (SELECT doc_id AS left_id, text FROM documents WHERE doc_id % 2 = 0),
       |rsrc AS (SELECT doc_id + 5000000 AS right_id, text || ' zzev' AS text
       |         FROM documents WHERE doc_id % 3 = 0),
       |${sideSh("lsrc", "left_id")},
       |${sideSh("rsrc", "right_id")},
       |dfc AS (SELECT sh, count(*) AS df FROM
       |          (SELECT sh FROM left_idsh UNION ALL SELECT sh FROM right_idsh) u
       |        GROUP BY sh),
       |cand AS (SELECT DISTINCT a.left_id, b.right_id
       |         FROM left_idsh a JOIN dfc ON a.sh = dfc.sh
       |         JOIN right_idsh b ON b.sh = a.sh
       |         WHERE dfc.df <= $ErMaxDf),
       |pr AS (SELECT c.left_id, c.right_id, count(*) AS shared
       |       FROM cand c JOIN left_idsh a ON a.left_id = c.left_id
       |       JOIN right_idsh b ON b.right_id = c.right_id AND b.sh = a.sh
       |       GROUP BY 1, 2),
       |szl AS (SELECT left_id, count(*) AS n_l FROM left_idsh GROUP BY 1),
       |szr AS (SELECT right_id, count(*) AS n_r FROM right_idsh GROUP BY 1),
       |erp AS (SELECT p.left_id, p.right_id, p.shared, sa.n_l, sb.n_r,
       |          CAST(round(CAST(CAST((p.shared / (sa.n_l + sb.n_r - p.shared)) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) AS jaccard
       |        FROM pr p JOIN szl sa ON p.left_id = sa.left_id
       |        JOIN szr sb ON p.right_id = sb.right_id
       |        WHERE 7 * p.shared >= 2 * (sa.n_l + sb.n_r))""".stripMargin
  }

  /** Jaccard tail shared by D2/D3 (tau = 1/2 as integer arithmetic). */
  private val jaccardTail =
    """SELECT p.doc_a, p.doc_b, p.shared, sa.n AS n_a, sb.n AS n_b,
      |  CAST(round(CAST(CAST((p.shared / (sa.n + sb.n - p.shared)) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) AS jaccard
      |FROM pr p JOIN sz sa ON p.doc_a = sa.doc_id JOIN sz sb ON p.doc_b = sb.doc_id
      |WHERE 3 * p.shared >= sa.n + sb.n
      |ORDER BY doc_a, doc_b""".stripMargin

  private val minhashSelect = Dedup.minhashPerms.zipWithIndex.map {
    case ((a, b), i) =>
      s"min(((sh % 1073741824) * $a + $b) % ${Dedup.MinhashP}) AS mh_$i"
  }.mkString(",\n       ")

  private val bandUnion = (0 until Dedup.MinhashK / Dedup.BandRows).map { j =>
    val parts = (0 until Dedup.BandRows)
      .map(k => s"mh_${Dedup.BandRows * j + k}::VARCHAR")
      .mkString(" || '_' || ")
    s"SELECT doc_id, $j AS band, md5($parts) AS bh FROM mh"
  }.mkString("\n  UNION ALL ")

  /** Full MinHash candidate + shared-count CTE chain (through `pr` and
    * `sz`), shared by the pair query and the cluster query.
    */
  private lazy val minhashPrCtes =
    s"""$shingleCtes,
       |mh AS (SELECT doc_id,
       |       $minhashSelect
       |  FROM sh GROUP BY doc_id),
       |bands AS (
       |  $bandUnion),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |         FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh
       |          AND x.doc_id < y.doc_id),
       |pr AS (SELECT c.doc_a, c.doc_b, count(*) AS shared
       |       FROM cand c
       |       JOIN sh a ON a.doc_id = c.doc_a
       |       JOIN sh b ON b.doc_id = c.doc_b AND b.sh = a.sh
       |       GROUP BY 1, 2)""".stripMargin

  /** Embeddings + squared norms, double-cast once (mirrors withNorm). */
  private val normCte =
    """n AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
      |       list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) AS nrm2
      |     FROM embeddings)""".stripMargin

  /** DuckDB twin of Similarity.lshBucket over column `v`: the plane
    * literals come from the same md5-derived generator the Spark side
    * uses, and list_dot_product matches the sequential-fold dot.
    * `salt`/`nPlanes` mirror the salted multi-table generators.
    */
  private def lshBucketSql(v: String, nPlanes: Int = 8,
      salt: String = ""): String =
    graft.operators.Similarity.hyperplanes(nPlanes, 64, salt).zipWithIndex.map {
      case (p, j) =>
        val arr = p.map(_.toString).mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product($v, $arr) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")

  /** DuckDB twin of the whole KMeansFixed fit at (k, iters): the
    * quantized long-format vector table, lowest-id seeding, and each
    * Lloyd round unrolled as assign (argmin over exact integer
    * squared-L2) + update (`sum // count`, empty cells keeping the
    * previous centroid via LEFT JOIN). Round `iters + 1` is the final
    * assignment whose distances feed the inertia.
    */
  private def kmeansOracleSql(k: Int, iters: Int): String = {
    val init =
      s"""m0 AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
         |         x -> CAST(floor((x + 1.0) * 1000000) AS BIGINT)) AS m
         |       FROM embeddings),
         |ml AS (SELECT vec_id, CAST(i AS BIGINT) AS dim, m[i] AS val
         |       FROM (SELECT vec_id, m,
         |               unnest(generate_series(1, len(m))) AS i FROM m0)),
         |c0 AS (SELECT ids.cell, ml.dim, ml.val AS c
         |       FROM (SELECT vec_id,
         |               row_number() OVER (ORDER BY vec_id) - 1 AS cell
         |             FROM (SELECT vec_id FROM m0 ORDER BY vec_id LIMIT $k)) ids
         |         JOIN ml USING (vec_id))""".stripMargin
    val rounds = (1 to (iters + 1)).map { i =>
      val p = i - 1
      val assign =
        s"""d$i AS (SELECT ml.vec_id, c.cell,
           |         sum((ml.val - c.c) * (ml.val - c.c)) AS dist
           |       FROM ml JOIN c$p c USING (dim) GROUP BY 1, 2),
           |a$i AS (SELECT vec_id, cell FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id
           |      ORDER BY dist, cell) AS rn FROM d$i) WHERE rn = 1)""".stripMargin
      val update = if (i <= iters)
        s""",
           |u$i AS (SELECT a.cell, ml.dim, sum(ml.val) AS s, count(*) AS cnt
           |        FROM ml JOIN a$i a USING (vec_id) GROUP BY 1, 2),
           |c$i AS (SELECT c.cell, c.dim,
           |          CAST(coalesce(u.s // u.cnt, c.c) AS BIGINT) AS c
           |        FROM c$p c LEFT JOIN u$i u
           |          ON c.cell = u.cell AND c.dim = u.dim)""".stripMargin
      else ""
      assign + update
    }.mkString(",\n")
    val f = iters + 1
    s"""WITH $init,
       |$rounds,
       |st AS (SELECT a.cell, count(*) AS n,
       |         CAST(sum(d.dist) AS BIGINT) AS inertia
       |       FROM a$f a JOIN d$f d
       |         ON a.vec_id = d.vec_id AND a.cell = d.cell
       |       GROUP BY 1)
       |SELECT c.cell, CAST(coalesce(st.n, 0) AS BIGINT) AS n, c.dim,
       |  c.c AS centroid_micro, CAST(coalesce(st.inertia, 0) AS BIGINT) AS inertia
       |FROM c$iters c LEFT JOIN st USING (cell)
       |ORDER BY c.cell, c.dim""".stripMargin
  }

  private val tokCte =
    """d AS (SELECT doc_id, lang, source, text,
      |       regexp_split_to_array(trim(text), '\s+') AS toks FROM documents)""".stripMargin

  private val bpeRegexSql = """[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"""

  /** S1 oracle — shared by the q_ann_topk entry and the sweep gate's
    * nested ground truth.
    */
  private lazy val annTopkRawSql =
    s"""WITH $normCte,
       |q AS (SELECT vec_id AS query_id, v AS qv, nrm2 AS qn FROM n WHERE vec_id < 10),
       |s AS (SELECT q.query_id, c.vec_id AS neighbor_id,
       |        list_dot_product(q.qv, c.v) / sqrt(q.qn * c.nrm2) AS cos
       |      FROM q JOIN n c ON q.query_id <> c.vec_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY cos DESC, neighbor_id) AS rnk FROM s)
       |SELECT query_id, rnk, neighbor_id, CAST(round(CAST(CAST((cos) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS cos
       |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin

  /** S3 oracle as a function of `nprobe` — the gated q_ann_ivf uses
    * nprobe=4 and the sweep gate nests the chain at each probe count,
    * so one definition serves both.
    */
  /** Deterministic IVF cell assignment (mirrors
    * IvfIndex.buildDeterministic at nlist=16) — shared by the ANN
    * chain oracles and the SemDeDup (D9) oracle.
    */
  private val ivfCellsCte =
    """cc AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
      |         v AS cv, nrm2 AS cn
      |       FROM (SELECT vec_id, v, nrm2 FROM n ORDER BY vec_id LIMIT 16)),
      |ad AS (SELECT n.vec_id, cc.cell,
      |         n.nrm2 - 2.0 * list_dot_product(n.v, cc.cv) + cc.cn AS d
      |       FROM n, cc),
      |asg AS (SELECT vec_id, cell FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id
      |      ORDER BY d, cell) AS rn FROM ad)
      |  WHERE rn = 1),
      |cells AS (SELECT n.vec_id, a.cell, n.v, n.nrm2
      |          FROM n JOIN asg a USING (vec_id))""".stripMargin

  private def ivfChainSql(nprobe: Int): String =
    s"""WITH $normCte,
       |$ivfCellsCte,
       |q AS (SELECT vec_id AS query_id, v AS qv, nrm2 AS qn
       |      FROM n WHERE vec_id < 10),
       |qp AS (SELECT query_id, qv, qn, cell FROM (
       |    SELECT q.query_id, q.qv, q.qn, cc.cell,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY q.qn - 2.0 * list_dot_product(q.qv, cc.cv) + cc.cn,
       |          cc.cell) AS pr
       |    FROM q, cc)
       |  WHERE pr <= $nprobe),
       |s AS (SELECT qp.query_id, c.vec_id AS neighbor_id,
       |        list_dot_product(qp.qv, c.v) / sqrt(qp.qn * c.nrm2) AS cos
       |      FROM qp JOIN cells c USING (cell) WHERE qp.query_id <> c.vec_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY cos DESC, neighbor_id) AS rnk FROM s)
       |SELECT query_id, rnk, neighbor_id, CAST(round(CAST(CAST((cos) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS cos
       |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin

  /** S2 oracle — the single-probe LSH chain; shared by the q_ann_lsh
    * entry and the S10 fusion oracle's LSH arm.
    */
  private lazy val annLshRawSql =
    s"""WITH $normCte,
       |nb AS (SELECT vec_id, v, nrm2,
       |         CAST(${lshBucketSql("v")} AS BIGINT) AS bucket
       |       FROM n),
       |q AS (SELECT vec_id AS query_id, v AS qv, nrm2 AS qn, bucket
       |      FROM nb WHERE vec_id < 10),
       |s AS (SELECT q.query_id, q.bucket, c.vec_id AS neighbor_id,
       |        list_dot_product(q.qv, c.v) / sqrt(q.qn * c.nrm2) AS cos
       |      FROM q JOIN nb c USING (bucket) WHERE q.query_id <> c.vec_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY cos DESC, neighbor_id) AS rnk FROM s)
       |SELECT query_id, bucket, rnk, neighbor_id, CAST(round(CAST(CAST((cos) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS cos
       |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin

  /** S5 oracle: reproduces the multi-probe bucket set — per-plane
    * dots (same literal hyperplanes), base bucket from the sign bits,
    * the 3 lowest-(|margin|, plane) flips by window rank, and the 8
    * mask-XOR probe buckets — then the same probe-join + rank tail as
    * S2. Flip bits are distinct powers of two, so subset XORs are
    * distinct and no candidate dedup is needed on either engine.
    */
  private lazy val annLshMpSql = {
    val planeRows = graft.operators.Similarity.hyperplanes(8, 64)
      .zipWithIndex.map { case (p, j) =>
        s"SELECT $j AS j, ${p.mkString("[", ", ", "]")} AS pl"
      }.mkString("\n  UNION ALL ")
    s"""WITH $normCte,
       |nb AS (SELECT vec_id, v, nrm2,
       |         CAST(${lshBucketSql("v")} AS BIGINT) AS bucket
       |       FROM n),
       |q AS (SELECT vec_id AS query_id, v AS qv, nrm2 AS qn FROM n WHERE vec_id < 10),
       |pl AS (
       |  $planeRows),
       |qm AS (SELECT q.query_id, p.j,
       |         abs(list_dot_product(q.qv, p.pl)) AS m,
       |         CASE WHEN list_dot_product(q.qv, p.pl) > 0
       |              THEN CAST(1 AS BIGINT) << p.j ELSE 0 END AS bit,
       |         CAST(1 AS BIGINT) << p.j AS flip
       |       FROM q, pl p),
       |qb AS (SELECT query_id, CAST(sum(bit) AS BIGINT) AS base FROM qm GROUP BY 1),
       |fl AS (SELECT query_id, flip, i FROM (
       |    SELECT query_id, flip,
       |      row_number() OVER (PARTITION BY query_id ORDER BY m, j) - 1 AS i
       |    FROM qm) WHERE i < 3),
       |fs AS (SELECT f.query_id, m.mask,
       |         CAST(coalesce(sum(CASE WHEN ((m.mask >> f.i) & 1) = 1
       |           THEN f.flip END), 0) AS BIGINT) AS fsum
       |       FROM fl f, (SELECT unnest(generate_series(0, 7)) AS mask) m
       |       GROUP BY 1, 2),
       |probes AS (SELECT fs.query_id, xor(qb.base, fs.fsum) AS bucket
       |           FROM fs JOIN qb USING (query_id)),
       |s AS (SELECT pr.query_id, c.vec_id AS neighbor_id,
       |        list_dot_product(q.qv, c.v) / sqrt(q.qn * c.nrm2) AS cos
       |      FROM probes pr
       |      JOIN nb c ON pr.bucket = c.bucket
       |      JOIN q ON q.query_id = pr.query_id
       |      WHERE pr.query_id <> c.vec_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY cos DESC, neighbor_id) AS rnk FROM s)
       |SELECT query_id, rnk, neighbor_id, CAST(round(CAST(CAST((cos) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS cos
       |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
  }

  /** S7 oracle: per-table bucket assignment via the salted plane
    * generators (one CASE arm per table, literal planes), the
    * (table, bucket)-keyed probe join, cross-table candidate dedup by
    * max(cos) on (query, neighbor) — the value is identical across
    * tables, so max IS dedup — then the shared rank tail.
    */
  private lazy val annLshMtSql = {
    def bucketCase(v: String): String =
      "CAST(CASE t " + (0 until 3).map { tb =>
        s"WHEN $tb THEN (${lshBucketSql(v, 6, s"t${tb}_")})"
      }.mkString(" ") + " END AS BIGINT)"
    s"""WITH $normCte,
       |tb AS (SELECT unnest([0, 1, 2]) AS t),
       |nb AS (SELECT vec_id, v, nrm2, t, ${bucketCase("v")} AS bucket
       |       FROM n, tb),
       |qb AS (SELECT vec_id AS query_id, v AS qv, nrm2 AS qn, t,
       |         ${bucketCase("v")} AS bucket
       |       FROM n, tb WHERE vec_id < 10),
       |cand AS (SELECT qb.query_id, c.vec_id AS neighbor_id,
       |           max(list_dot_product(qb.qv, c.v) / sqrt(qb.qn * c.nrm2)) AS cos
       |         FROM qb JOIN nb c ON qb.t = c.t AND qb.bucket = c.bucket
       |         WHERE qb.query_id <> c.vec_id
       |         GROUP BY 1, 2),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY cos DESC, neighbor_id) AS rnk FROM cand)
       |SELECT query_id, rnk, neighbor_id, CAST(round(CAST(CAST((cos) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS cos
       |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
  }

  /** One constant for both quota arms (window + RankSelect): their
    * contract is literal set equality against the identical SQL.
    */
  private val QuotaSampleOracleSql: String =
    """SELECT doc_id, source FROM (
      |  SELECT doc_id, source, row_number() OVER (
      |      PARTITION BY source
      |      ORDER BY md5('quota_' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents)
      |WHERE rk <= 40 ORDER BY doc_id""".stripMargin

  private val oracleBase: Map[String, String] = Map(
    // T16: the identical BM25 float program — literal ops spelled the
    // same way ((1.2 + 1), 1 - 0.75) so both engines constant-fold to
    // identical IEEE values; idf and per-term scores round-6; the
    // 3-term sum is one fixed left-to-right expression.
    "q_bm25" ->
      """WITH tok AS (SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents),
        |d AS (SELECT doc_id, len(toks) AS dl,
        |    len(list_filter(toks, x -> x = 'merge')) AS tf0,
        |    len(list_filter(toks, x -> x = 'quantum')) AS tf1,
        |    len(list_filter(toks, x -> x = 'spark')) AS tf2
        |  FROM tok),
        |st AS (SELECT count(*) AS n_docs,
        |    CAST(sum(dl) AS BIGINT) AS total_tokens,
        |    CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
        |    CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
        |    CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
        |  FROM d),
        |sc AS (SELECT doc_id, dl,
        |    (CASE WHEN tf0 > 0 THEN 1 ELSE 0 END
        |      + CASE WHEN tf1 > 0 THEN 1 ELSE 0 END
        |      + CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS n_terms_hit,
        |    CAST(round(CAST(CAST((
        |      (CASE WHEN tf0 > 0 THEN CAST(round(CAST(CAST((
        |        CAST(round(CAST(CAST((ln(1.0 + (CAST(n_docs AS DOUBLE) - df0 + 0.5)
        |          / (df0 + 0.5))) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE)
        |        * (tf0 * (CAST(1.2 AS DOUBLE) + 1)) / (tf0 + CAST(1.2 AS DOUBLE) * (1.0 - 0.75
        |          + 0.75 * dl / (CAST(total_tokens AS DOUBLE) / n_docs)))) AS VARCHAR) AS DECIMAL(38,18)),
        |        6) AS DOUBLE) ELSE 0.0 END)
        |      + (CASE WHEN tf1 > 0 THEN CAST(round(CAST(CAST((
        |        CAST(round(CAST(CAST((ln(1.0 + (CAST(n_docs AS DOUBLE) - df1 + 0.5)
        |          / (df1 + 0.5))) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE)
        |        * (tf1 * (CAST(1.2 AS DOUBLE) + 1)) / (tf1 + CAST(1.2 AS DOUBLE) * (1.0 - 0.75
        |          + 0.75 * dl / (CAST(total_tokens AS DOUBLE) / n_docs)))) AS VARCHAR) AS DECIMAL(38,18)),
        |        6) AS DOUBLE) ELSE 0.0 END)
        |      + (CASE WHEN tf2 > 0 THEN CAST(round(CAST(CAST((
        |        CAST(round(CAST(CAST((ln(1.0 + (CAST(n_docs AS DOUBLE) - df2 + 0.5)
        |          / (df2 + 0.5))) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE)
        |        * (tf2 * (CAST(1.2 AS DOUBLE) + 1)) / (tf2 + CAST(1.2 AS DOUBLE) * (1.0 - 0.75
        |          + 0.75 * dl / (CAST(total_tokens AS DOUBLE) / n_docs)))) AS VARCHAR) AS DECIMAL(38,18)),
        |        6) AS DOUBLE) ELSE 0.0 END)) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS bm25
        |  FROM d CROSS JOIN st)
        |SELECT doc_id, CAST(dl AS BIGINT) AS dl, n_terms_hit, bm25,
        |  CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
        |    AS INTEGER) AS rnk
        |FROM sc WHERE n_terms_hit > 0
        |ORDER BY rnk LIMIT 50""".stripMargin,
    // P13: the oracle manifests the source table directly — the Spark
    // side manifests the written-and-read-back artifact; HUGEINT sum
    // rendered as VARCHAR (the one dtype a 38-digit integer survives
    // everywhere). Same 4-source gate scope as the Spark side.
    "q_release_manifest" ->
      s"""SELECT source, count(*) AS n_rows,
         |  CAST(CAST(sum(${graft.functions.Hashing.md5Long60Sql(
             "CAST(doc_id AS VARCHAR) || '|' || coalesce(text, '')")})
         |    AS HUGEINT) AS VARCHAR) AS content_sum,
         |  min(doc_id) AS min_id, max(doc_id) AS max_id
         |FROM documents
         |WHERE source IN ('src0', 'src1', 'src2', 'src3')
         |GROUP BY source ORDER BY source""".stripMargin,
    // T17: identical RE2 classes; count = len - len(after removal)
    // (DuckDB needs the 'g' flag Spark applies implicitly).
    "q_char_sanity" ->
      """WITH c AS (SELECT doc_id, length(text) AS n_chars,
        |    length(text) - length(regexp_replace(text,
        |      '[^\x00-\x7F]', '', 'g')) AS n_non_ascii,
        |    length(text) - length(regexp_replace(text,
        |      '[0-9]', '', 'g')) AS n_digit,
        |    length(text) - length(regexp_replace(text,
        |      '[^A-Za-z0-9\s]', '', 'g')) AS n_other,
        |    length(text) - length(regexp_replace(text,
        |      '[\x00-\x08\x0B\x0C\x0E-\x1F]', '', 'g')) AS n_control,
        |    length(text) - length(regexp_replace(text,
        |      '\x{FFFD}', '', 'g')) AS n_replacement
        |  FROM documents)
        |SELECT doc_id, n_chars, n_non_ascii, n_digit, n_other,
        |  n_control, n_replacement,
        |  CASE WHEN n_chars = 0 THEN 0.0
        |    ELSE CAST(round(CAST(CAST((n_non_ascii / CAST(n_chars AS DOUBLE)) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) END
        |    AS non_ascii_ratio,
        |  CASE WHEN n_control = 0 AND n_replacement = 0
        |    THEN 1 ELSE 0 END AS is_clean
        |FROM c ORDER BY doc_id""".stripMargin,
    // C6: identical expected-count expression + the ordered-window
    // chi-square sum (the PSI accumulation device).
    "q_drift_chi2" ->
      s"""WITH rows0 AS (SELECT source, lang AS category,
        |    (${Sampling.bucketOfSql("doc_id", "chi2", 2)} = 0) AS r
        |  FROM documents WHERE lang IS NOT NULL),
        |c AS (SELECT source, category,
        |    CAST(sum(CASE WHEN r THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
        |    CAST(sum(CASE WHEN r THEN 0 ELSE 1 END) AS BIGINT) AS c_cur
        |  FROM rows0 GROUP BY 1, 2),
        |t AS (SELECT *,
        |    CAST(sum(c_ref) OVER (PARTITION BY source) AS BIGINT) AS n_ref,
        |    CAST(sum(c_cur) OVER (PARTITION BY source) AS BIGINT) AS n_cur,
        |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_cats
        |  FROM c),
        |p AS (SELECT *, (n_cur * (c_ref + CAST(0.5 AS DOUBLE)))
        |    / (n_ref + CAST(0.5 AS DOUBLE) * n_cats) AS e FROM t)
        |SELECT source, category, c_ref, c_cur, n_ref, n_cur,
        |  CAST(round(CAST(CAST((e) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS expected,
        |  CAST(round(CAST(CAST((sum((c_cur - e) * (c_cur - e) / e) OVER (PARTITION BY source
        |    ORDER BY category ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND UNBOUNDED FOLLOWING)) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS chi2,
        |  n_cats - 1 AS dof
        |FROM p ORDER BY source, category""".stripMargin,
    // E3: the identical (i, j) moment expansion — decimal-exact sums,
    // round-6, one double cast; float->double widening is exact in
    // both engines.
    "q_pca_moments" ->
      """WITH v AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |a AS (SELECT v, unnest(generate_series(1, len(v))) AS i1 FROM v),
        |b AS (SELECT v, i1, unnest(generate_series(i1, len(v))) AS j1 FROM a)
        |SELECT CAST(i1 - 1 AS INTEGER) AS i, CAST(j1 - 1 AS INTEGER) AS j,
        |  CAST(round(sum(CAST(v[i1] * v[j1] AS DECIMAL(28,10))), 6)
        |    AS DOUBLE) AS sxy,
        |  CAST(round(sum(CAST(v[i1] AS DECIMAL(28,10))), 6)
        |    AS DOUBLE) AS sx,
        |  count(*) AS n
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // E3b: the grouped twin of the q_pca_moments expansion.
    "q_pca_moments_by" ->
      """WITH v AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |a AS (SELECT label, v, unnest(generate_series(1, len(v))) AS i1
        |  FROM v),
        |b AS (SELECT label, v, i1,
        |    unnest(generate_series(i1, len(v))) AS j1 FROM a)
        |SELECT label, CAST(i1 - 1 AS INTEGER) AS i,
        |  CAST(j1 - 1 AS INTEGER) AS j,
        |  CAST(round(sum(CAST(v[i1] * v[j1] AS DECIMAL(28,10))), 6)
        |    AS DOUBLE) AS sxy,
        |  CAST(round(sum(CAST(v[i1] AS DECIMAL(28,10))), 6)
        |    AS DOUBLE) AS sx,
        |  count(*) AS n
        |FROM b GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // C5: one aggregation on the QI columns; all-integer outputs.
    "q_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment, count(*) AS n,
        |  count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
        |    AS l_diversity,
        |  CASE WHEN count(*) < 10 THEN 1 ELSE 0 END AS at_risk
        |FROM customer GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // P12: the D2 shingle kernel keyed by source, distinct per
    // source, self-joined on the shingle hash.
    "q_source_overlap" ->
      s"""WITH tok AS (SELECT source,
         |    regexp_split_to_array(trim(text), '\\s+') AS toks
         |  FROM documents),
         |th AS (SELECT source,
         |    list_transform(toks, t -> ${Hashing.h30Sql("t")}) AS th
         |  FROM tok WHERE len(toks) >= 3),
         |sh AS (SELECT DISTINCT source, $shingleCombineSql AS sh
         |  FROM (SELECT source, th,
         |      unnest(generate_series(1, len(th) - 2)) AS i FROM th) x),
         |sz AS (SELECT source, count(*) AS n FROM sh GROUP BY 1),
         |pr AS (SELECT a.source AS src_a, b.source AS src_b,
         |    count(*) AS n_common
         |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT pr.src_a, pr.src_b, pr.n_common, sa.n AS n_a, sb.n AS n_b,
         |  CAST(round(CAST(CAST((CAST(pr.n_common AS DOUBLE)
         |    / (sa.n + sb.n - pr.n_common)) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS jaccard
         |FROM pr JOIN sz sa ON pr.src_a = sa.source
         |JOIN sz sb ON pr.src_b = sb.source
         |ORDER BY 1, 2""".stripMargin,
    "q_heavy_hitters" ->
      """WITH t AS (SELECT lang,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS item
        |  FROM documents),
        |c AS (SELECT lang, item, count(*) AS n FROM t GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY lang
        |    ORDER BY n DESC, item) - 1 AS pos FROM c)
        |SELECT lang, CAST(pos AS INTEGER) AS pos, item, n
        |FROM r ORDER BY lang, pos""".stripMargin,
    "q_pipeline" ->
      s"""WITH corpus AS ($dupCorpusSql),
         |kept AS (SELECT min(doc_id) AS doc_id FROM corpus GROUP BY md5(text)),
         |d AS (SELECT doc.doc_id, doc.lang, doc.text,
         |       regexp_split_to_array(trim(doc.text), '\\s+') AS toks
         |      FROM documents doc JOIN kept ON doc.doc_id = kept.doc_id),
         |st AS (SELECT doc_id, lang,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  len(list_filter(toks, t -> t IN ('the','a','of','to','and','in','is'))) AS n_stop,
         |  length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS n_punct,
         |  length(text) AS n_chars
         | FROM d),
         |q AS (SELECT doc_id, lang, n_tokens,
         |  CAST(round(CAST(CAST((least(1.0, n_tokens / 100.0) * (1.0 - n_punct / n_chars)
         |        * (1.0 - n_stop / n_tokens)) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) AS quality
         | FROM st)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(round(sum(CAST(quality AS DECIMAL(10,4))), 2) AS DOUBLE) AS sum_quality,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
         |FROM q WHERE quality >= 0.5 AND n_tokens >= 20
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_dedup_exact" ->
      s"""WITH corpus AS ($dupCorpusSql)
         |SELECT md5(text) AS content_hash, count(*) AS n_copies, min(doc_id) AS keep_id
         |FROM corpus GROUP BY 1 ORDER BY content_hash""".stripMargin,
    "q_chunk" -> {
      val (w, s0) = (ChunkWindow, ChunkStride)
      s"""WITH tk AS (SELECT doc_id,
         |              regexp_split_to_array(trim(coalesce(text, '')), '\\s+') AS toks
         |            FROM documents),
         |n AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens FROM tk),
         |c AS (SELECT doc_id, toks, n_tokens,
         |        CASE WHEN n_tokens <= $w THEN 1
         |             ELSE 1 + (n_tokens - $w + $s0 - 1) // $s0 END AS n_chunks
         |      FROM n),
         |e AS (SELECT doc_id, toks, n_tokens,
         |        unnest(generate_series(0, n_chunks - 1)) AS chunk_id FROM c),
         |x AS (SELECT doc_id, toks, n_tokens, chunk_id,
         |        chunk_id * $s0 + 1 AS token_start,
         |        least($w, n_tokens - (chunk_id * $s0 + 1) + 1) AS chunk_tokens
         |      FROM e)
         |SELECT doc_id, n_tokens, chunk_id, token_start, chunk_tokens,
         |  md5(array_to_string(toks[token_start:(token_start + chunk_tokens - 1)], ' '))
         |    AS chunk_hash
         |FROM x ORDER BY doc_id, chunk_id""".stripMargin
    },
    "q_mix_temperature" -> {
      val b = Sampling.bucketOfSql("doc_id", "tmix", 1000000)
      s"""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
         |w AS (SELECT source, n, CAST(CAST(round(CAST(CAST((sqrt(n)) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS DECIMAL(18,6)) AS w FROM c),
         |tot AS (SELECT CAST(round(sum(w), 6) AS DOUBLE) AS wsum,
         |          CAST(sum(n) AS BIGINT) AS total FROM w),
         |t AS (SELECT source, least(1000000, CAST(floor(
         |          1e6 * $TmixTotalFrac * total * (CAST(w AS DOUBLE) / wsum) / n)
         |        AS BIGINT)) AS thr
         |      FROM w, tot)
         |SELECT d.doc_id, d.source
         |FROM documents d JOIN t ON d.source = t.source
         |WHERE $b < t.thr
         |ORDER BY d.doc_id""".stripMargin
    },
    // C4: novelty vs the reference slice — distinct reference grams,
    // one hash join, integer counts.
    "q_novelty" -> {
      def sideSh(pred: String, name: String) =
        s"""${name}tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
           |        FROM documents WHERE $pred),
           |${name}th AS (SELECT doc_id, list_transform(toks, t -> ${Hashing.h30Sql("t")}) AS th
           |        FROM ${name}tok WHERE len(toks) >= 3),
           |${name}sh AS (SELECT DISTINCT doc_id, $shingleCombineSql AS sh
           |        FROM (SELECT doc_id, th, unnest(generate_series(1, len(th) - 2)) AS i
           |              FROM ${name}th) x)""".stripMargin
      s"""WITH ${sideSh("doc_id % 7 <> 0", "d")},
         |${sideSh("doc_id % 7 = 0", "r")},
         |ref AS (SELECT DISTINCT sh FROM rsh)
         |SELECT d.doc_id, count(*) AS n_grams,
         |  CAST(sum(CASE WHEN ref.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_seen,
         |  CAST(round(CAST(CAST((1.0 - sum(CASE WHEN ref.sh IS NOT NULL THEN 1 ELSE 0 END)
         |    / count(*)) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) AS novelty
         |FROM dsh d LEFT JOIN ref ON d.sh = ref.sh
         |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin
    },
    // P11: the dataset card — T1's quality legs + rank-selected order
    // statistics per (source, lang).
    "q_corpus_card" ->
      s"""WITH $tokCte,
         |s AS (SELECT doc_id, source, lang,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  len(list_filter(toks, t -> t IN ('the','a','of','to','and','in','is'))) AS n_stop,
         |  length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS n_punct,
         |  length(text) AS n_chars
         | FROM d),
         |q AS (SELECT doc_id, source, lang, n_tokens,
         |  CAST(round(CAST(CAST((least(1.0, n_tokens / 100.0) * (1.0 - n_punct / n_chars)
         |        * (1.0 - n_stop / n_tokens)) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) AS quality
         | FROM s),
         |r AS (SELECT *,
         |  row_number() OVER (PARTITION BY source, lang
         |    ORDER BY quality, doc_id) AS rq,
         |  row_number() OVER (PARTITION BY source, lang
         |    ORDER BY n_tokens, doc_id) AS rt,
         |  count(*) OVER (PARTITION BY source, lang) AS cnt
         | FROM q)
         |SELECT source, lang, CAST(max(cnt) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |  min(CASE WHEN rq * 2 >= cnt THEN quality END) AS med_quality,
         |  CAST(min(CASE WHEN rt * 10 >= cnt * 9 THEN n_tokens END) AS BIGINT)
         |    AS p90_tokens
         |FROM r GROUP BY source, lang ORDER BY source, lang""".stripMargin,
    // T15: the oracle never sees the HTML — it states the ground
    // truth the extraction must recover.
    "q_html_extract" ->
      s"""WITH e AS (SELECT doc_id,
         |    'Doc ' || CAST(doc_id AS VARCHAR) || ' ' || text
         |      || ' & <tag> "q''' AS expected
         |  FROM documents)
         |SELECT doc_id, CAST(length(expected) AS BIGINT) AS n_chars,
         |  md5(expected) AS text_md5
         |FROM e ORDER BY doc_id""".stripMargin,
    "q_er_pairs" ->
      s"""WITH $erCtes
         |SELECT left_id, right_id, shared, n_l, n_r, jaccard FROM erp
         |ORDER BY left_id, right_id""".stripMargin,
    "q_er_match" ->
      s"""WITH $erCtes,
         |rk AS (SELECT *,
         |         row_number() OVER (PARTITION BY left_id
         |           ORDER BY jaccard DESC, right_id) AS rl,
         |         row_number() OVER (PARTITION BY right_id
         |           ORDER BY jaccard DESC, left_id) AS rr
         |       FROM erp)
         |SELECT left_id, right_id, shared, n_l, n_r, jaccard
         |FROM rk WHERE rl = 1 AND rr = 1 ORDER BY left_id""".stripMargin,
    "q_dedup_ngram" ->
      s"""WITH $shingleCtes,
         |shd AS (SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM sh),
         |shc AS (SELECT doc_id, sh FROM shd WHERE df <= $NgramMaxDf),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id),
         |pr AS (SELECT c.doc_a, c.doc_b, count(*) AS shared
         |       FROM cand c
         |       JOIN sh a ON a.doc_id = c.doc_a
         |       JOIN sh b ON b.doc_id = c.doc_b AND b.sh = a.sh
         |       GROUP BY 1, 2)
         |$jaccardTail""".stripMargin,
    "q_dedup_minhash" ->
      s"""WITH $minhashPrCtes
         |$jaccardTail""".stripMargin,
    // D4b: the D4 sims chain, a 5x6-bit pigeonhole-exact truth band
    // join (no cap), the production 3x10 capped band join, and the
    // per-Hamming recall.
    "q_simhash_recall" -> {
      val bitSums = (0 until 30).map(j =>
        s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b_$j")
        .mkString(",\n       ")
      val simExpr = (0 until 30).map(j =>
        s"(CASE WHEN b_$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
      s"""WITH $shingleCtes,
         |hb AS (SELECT doc_id, sh % 1073741824 AS h FROM sh),
         |bits AS (SELECT doc_id,
         |       $bitSums
         |  FROM hb GROUP BY doc_id),
         |sims AS (SELECT doc_id, $simExpr AS simhash FROM bits),
         |tb AS (SELECT doc_id, simhash, band,
         |       (simhash >> (6 * band)) & 63 AS bv
         |  FROM sims, (SELECT unnest(generate_series(0, 4)) AS band) b),
         |tr AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |       bit_count(xor(x.simhash, y.simhash)) AS hamming
         |  FROM tb x JOIN tb y
         |    ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id)
         |  ,
         |fb AS (SELECT doc_id, simhash, band,
         |       (simhash >> (10 * band)) & 1023 AS bv
         |  FROM sims, (SELECT unnest(generate_series(0, 2)) AS band) b),
         |fbg AS (SELECT doc_id, band, bv FROM (
         |    SELECT *, count(*) OVER (PARTITION BY band, bv) AS w FROM fb)
         |  WHERE w <= $SimhashMaxBucket),
         |fp AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM fbg x JOIN fbg y
         |    ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id),
         |lab AS (SELECT t.hamming,
         |          CASE WHEN f.doc_a IS NULL THEN 0 ELSE 1 END AS hit
         |        FROM tr t LEFT JOIN fp f
         |          ON t.doc_a = f.doc_a AND t.doc_b = f.doc_b
         |        WHERE t.hamming <= 3)
         |SELECT CAST(hamming AS BIGINT) AS hamming, count(*) AS n_true,
         |  CAST(sum(hit) AS BIGINT) AS n_hit,
         |  CAST(round(CAST(CAST((CAST(sum(hit) AS BIGINT) / count(*)) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) AS recall
         |FROM lab GROUP BY hamming ORDER BY hamming""".stripMargin
    },
    // D10: the D2 capped truth chain (shd/shc/ncand/npr) and the D3
    // LSH chain (minhashPrCtes' cand/pr) composed over the SAME
    // shingle CTEs, then the integer Jaccard bucket + recall.
    "q_dedup_recall" ->
      s"""WITH $minhashPrCtes,
         |lsh AS (SELECT p.doc_a, p.doc_b
         |        FROM pr p JOIN sz sa ON p.doc_a = sa.doc_id
         |        JOIN sz sb ON p.doc_b = sb.doc_id
         |        WHERE 3 * p.shared >= sa.n + sb.n),
         |shd AS (SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM sh),
         |shc AS (SELECT doc_id, sh FROM shd WHERE df <= $NgramMaxDf),
         |ncand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |          FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id),
         |npr AS (SELECT c.doc_a, c.doc_b, count(*) AS shared
         |        FROM ncand c
         |        JOIN sh a ON a.doc_id = c.doc_a
         |        JOIN sh b ON b.doc_id = c.doc_b AND b.sh = a.sh
         |        GROUP BY 1, 2),
         |truthp AS (SELECT p.doc_a, p.doc_b, p.shared, sa.n AS n_a, sb.n AS n_b
         |           FROM npr p JOIN sz sa ON p.doc_a = sa.doc_id
         |           JOIN sz sb ON p.doc_b = sb.doc_id
         |           WHERE 3 * p.shared >= sa.n + sb.n),
         |lab AS (SELECT (10 * t.shared) // (t.n_a + t.n_b - t.shared) AS bucket,
         |          CASE WHEN l.doc_a IS NULL THEN 0 ELSE 1 END AS hit
         |        FROM truthp t LEFT JOIN lsh l
         |          ON t.doc_a = l.doc_a AND t.doc_b = l.doc_b)
         |SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_true,
         |  CAST(sum(hit) AS BIGINT) AS n_hit,
         |  CAST(round(CAST(CAST((CAST(sum(hit) AS BIGINT) / count(*)) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) AS recall
         |FROM lab GROUP BY bucket ORDER BY bucket""".stripMargin,
    // C7: the D3 pair chain + the P2 split buckets, re-derived — the
    // same jaccard >= 1/2 integer tail, the same md5 split kernel.
    "q_split_leakage" -> {
      def splitOf(c: String) = {
        val b = graft.operators.Sampling.bucketOfSql(c, "split", 100)
        s"""CASE WHEN $b < 80 THEN 'train'
           |     WHEN $b < 90 THEN 'val' ELSE 'test' END""".stripMargin
      }
      s"""WITH $minhashPrCtes,
         |pairs AS (SELECT p.doc_a, p.doc_b
         |          FROM pr p JOIN sz sa ON p.doc_a = sa.doc_id
         |          JOIN sz sb ON p.doc_b = sb.doc_id
         |          WHERE 3 * p.shared >= sa.n + sb.n),
         |lab AS (SELECT doc_a, doc_b,
         |          ${splitOf("doc_a")} AS split_a,
         |          ${splitOf("doc_b")} AS split_b
         |        FROM pairs)
         |SELECT split_a, split_b, count(*) AS n_pairs,
         |  CAST(CASE WHEN split_a <> split_b THEN 1 ELSE 0 END AS BIGINT)
         |    AS is_leak
         |FROM lab GROUP BY 1, 2 ORDER BY split_a, split_b""".stripMargin
    },
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE $minhashPrCtes,
         |jp AS (SELECT p.doc_a, p.doc_b
         |       FROM pr p JOIN sz sa ON p.doc_a = sa.doc_id
         |       JOIN sz sb ON p.doc_b = sb.doc_id
         |       WHERE 3 * p.shared >= sa.n + sb.n),
         |edges AS (SELECT doc_a AS v, doc_b AS u FROM jp
         |          UNION ALL SELECT doc_b, doc_a FROM jp),
         |reach(v, m) AS (
         |  SELECT doc_id, doc_id FROM corpus
         |  UNION
         |  SELECT e.v, r.m FROM edges e JOIN reach r ON r.v = e.u)
         |SELECT v AS doc_id, min(m) AS cluster_id
         |FROM reach GROUP BY v ORDER BY doc_id""".stripMargin,
    // D11: the D6 recursive-CTE cluster labels joined with the length
    // quality proxy; winner per cluster = (q DESC, doc_id ASC) first.
    "q_dedup_keep" ->
      s"""WITH RECURSIVE $minhashPrCtes,
         |jp AS (SELECT p.doc_a, p.doc_b
         |       FROM pr p JOIN sz sa ON p.doc_a = sa.doc_id
         |       JOIN sz sb ON p.doc_b = sb.doc_id
         |       WHERE 3 * p.shared >= sa.n + sb.n),
         |edges AS (SELECT doc_a AS v, doc_b AS u FROM jp
         |          UNION ALL SELECT doc_b, doc_a FROM jp),
         |reach(v, m) AS (
         |  SELECT doc_id, doc_id FROM corpus
         |  UNION
         |  SELECT e.v, r.m FROM edges e JOIN reach r ON r.v = e.u),
         |lab AS (SELECT v AS doc_id, min(m) AS cluster_id
         |        FROM reach GROUP BY v),
         |mem AS (SELECT l.doc_id, l.cluster_id, length(c.text) AS q
         |        FROM lab l JOIN corpus c USING (doc_id)),
         |r AS (SELECT doc_id, cluster_id, q,
         |        row_number() OVER (PARTITION BY cluster_id
         |                           ORDER BY q DESC, doc_id) AS rn,
         |        count(*) OVER (PARTITION BY cluster_id) AS cluster_size
         |      FROM mem),
         |k AS (SELECT cluster_id, doc_id AS keep_id FROM r WHERE rn = 1)
         |SELECT r.doc_id, r.cluster_id, r.cluster_size, k.keep_id,
         |  CAST(CASE WHEN r.doc_id = k.keep_id THEN 1 ELSE 0 END AS BIGINT)
         |    AS is_kept
         |FROM r JOIN k USING (cluster_id) ORDER BY doc_id""".stripMargin,
    "q_dedup_simhash" -> {
      val bitSums = (0 until 30).map(j =>
        s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b_$j")
        .mkString(",\n       ")
      val simExpr = (0 until 30).map(j =>
        s"(CASE WHEN b_$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
      s"""WITH $shingleCtes,
         |hb AS (SELECT doc_id, sh % 1073741824 AS h FROM sh),
         |bits AS (SELECT doc_id,
         |       $bitSums
         |  FROM hb GROUP BY doc_id),
         |sims AS (SELECT doc_id, $simExpr AS simhash FROM bits),
         |bands AS (SELECT doc_id, simhash, band,
         |       (simhash >> (10 * band)) & 1023 AS bv
         |  FROM sims, (SELECT unnest(generate_series(0, 2)) AS band) b),
         |bg AS (SELECT doc_id, simhash, band, bv FROM (
         |    SELECT *, count(*) OVER (PARTITION BY band, bv) AS w FROM bands)
         |  WHERE w <= $SimhashMaxBucket),
         |pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |       bit_count(xor(x.simhash, y.simhash)) AS hamming
         |  FROM bg x JOIN bg y
         |    ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id)
         |SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
         |FROM pairs WHERE hamming <= 3
         |ORDER BY doc_a, doc_b""".stripMargin
    },
    "q_dup_passages" -> {
      val combine5 = {
        import graft.operators.Dedup.ShingleCoef
        (0 until 5).map(k => s"${ShingleCoef(k)} * th[i + $k]").mkString(" + ")
      }
      s"""WITH tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents),
         |th AS (SELECT doc_id, toks, list_transform(toks, t -> ${Hashing.h30Sql("t")}) AS th
         |       FROM tok WHERE len(toks) >= 5),
         |sh AS (SELECT doc_id, i AS pos, $combine5 AS sh
         |       FROM (SELECT doc_id, th, unnest(generate_series(1, len(th) - 4)) AS i FROM th) x),
         |dup AS (SELECT sh FROM sh GROUP BY sh HAVING count(DISTINCT doc_id) >= 2),
         |dp AS (SELECT DISTINCT s.doc_id, s.pos + o.o AS tp
         |       FROM sh s JOIN dup USING (sh),
         |            (SELECT unnest(generate_series(0, 4)) AS o) o),
         |sp AS (SELECT doc_id, tp,
         |         CASE WHEN lag(tp) OVER w IS NULL OR tp > lag(tp) OVER w + 1
         |              THEN 1 ELSE 0 END AS new_span
         |       FROM dp WINDOW w AS (PARTITION BY doc_id ORDER BY tp)),
         |agg AS (SELECT doc_id, count(*) AS dup_tokens,
         |          CAST(sum(new_span) AS BIGINT) AS n_spans, list(tp) AS cov
         |        FROM sp GROUP BY doc_id)
         |SELECT a.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
         |  a.dup_tokens, a.n_spans,
         |  CAST(round(CAST(CAST((a.dup_tokens / len(t.toks)) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) AS dup_frac,
         |  md5(coalesce(array_to_string(
         |    list_filter(t.toks, (x, i) -> NOT list_contains(a.cov, i)), ' '), '')) AS keep_hash
         |FROM agg a JOIN th t USING (doc_id) ORDER BY doc_id""".stripMargin
    },
    // D7c: the D7 chain + span ids, qualifying spans >= 8 tokens only,
    // their covered positions, and the cleaned-content hash.
    "q_dup_clean" -> {
      val combine5 = {
        import graft.operators.Dedup.ShingleCoef
        (0 until 5).map(k => s"${ShingleCoef(k)} * th[i + $k]").mkString(" + ")
      }
      s"""WITH tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents),
         |th AS (SELECT doc_id, toks, list_transform(toks, t -> ${Hashing.h30Sql("t")}) AS th
         |       FROM tok WHERE len(toks) >= 5),
         |sh AS (SELECT doc_id, i AS pos, $combine5 AS sh
         |       FROM (SELECT doc_id, th, unnest(generate_series(1, len(th) - 4)) AS i FROM th) x),
         |dup AS (SELECT sh FROM sh GROUP BY sh HAVING count(DISTINCT doc_id) >= 2),
         |dp AS (SELECT DISTINCT s.doc_id, s.pos + o.o AS tp
         |       FROM sh s JOIN dup USING (sh),
         |            (SELECT unnest(generate_series(0, 4)) AS o) o),
         |sp AS (SELECT doc_id, tp,
         |         CASE WHEN lag(tp) OVER w IS NULL OR tp > lag(tp) OVER w + 1
         |              THEN 1 ELSE 0 END AS new_span
         |       FROM dp WINDOW w AS (PARTITION BY doc_id ORDER BY tp)),
         |sid AS (SELECT doc_id, tp,
         |          sum(new_span) OVER (PARTITION BY doc_id ORDER BY tp) AS span_id
         |        FROM sp),
         |spans AS (SELECT doc_id, span_id, min(tp) AS span_start,
         |            count(*) AS span_len
         |          FROM sid GROUP BY doc_id, span_id),
         |qual AS (SELECT * FROM spans WHERE span_len >= 8),
         |cov AS (SELECT doc_id,
         |          unnest(generate_series(span_start, span_start + span_len - 1)) AS tp
         |        FROM qual),
         |agg AS (SELECT doc_id, count(*) AS removed_tokens, list(tp) AS cov
         |        FROM cov GROUP BY doc_id),
         |nsp AS (SELECT doc_id, count(*) AS n_spans_removed FROM qual GROUP BY doc_id)
         |SELECT a.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
         |  a.removed_tokens, n.n_spans_removed,
         |  md5(coalesce(array_to_string(
         |    list_filter(t.toks, (x, i) -> NOT list_contains(a.cov, i)), ' '), '')) AS keep_hash
         |FROM agg a JOIN nsp n USING (doc_id) JOIN th t USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },
    // C8: train grams semi-joined against the eval split's distinct
    // gram set, then the same qualifying-span removal tail as D7c.
    "q_decontaminate" -> {
      val combine5 = {
        import graft.operators.Dedup.ShingleCoef
        (0 until 5).map(k => s"${ShingleCoef(k)} * th[i + $k]").mkString(" + ")
      }
      s"""WITH tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents),
         |th AS (SELECT doc_id, toks, list_transform(toks, t -> ${Hashing.h30Sql("t")}) AS th
         |       FROM tok WHERE len(toks) >= 5),
         |sh AS (SELECT doc_id, i AS pos, $combine5 AS sh
         |       FROM (SELECT doc_id, th, unnest(generate_series(1, len(th) - 4)) AS i
         |             FROM th WHERE doc_id % 10 <> 7) x),
         |esh AS (SELECT DISTINCT $combine5 AS sh
         |        FROM (SELECT doc_id, th, unnest(generate_series(1, len(th) - 4)) AS i
         |              FROM th WHERE doc_id % 10 = 7) x),
         |dp AS (SELECT DISTINCT s.doc_id, s.pos + o.o AS tp
         |       FROM sh s JOIN esh USING (sh),
         |            (SELECT unnest(generate_series(0, 4)) AS o) o),
         |sp AS (SELECT doc_id, tp,
         |         CASE WHEN lag(tp) OVER w IS NULL OR tp > lag(tp) OVER w + 1
         |              THEN 1 ELSE 0 END AS new_span
         |       FROM dp WINDOW w AS (PARTITION BY doc_id ORDER BY tp)),
         |sid AS (SELECT doc_id, tp,
         |          sum(new_span) OVER (PARTITION BY doc_id ORDER BY tp) AS span_id
         |        FROM sp),
         |spans AS (SELECT doc_id, span_id, min(tp) AS span_start,
         |            count(*) AS span_len
         |          FROM sid GROUP BY doc_id, span_id),
         |qual AS (SELECT * FROM spans WHERE span_len >= 8),
         |cov AS (SELECT doc_id,
         |          unnest(generate_series(span_start, span_start + span_len - 1)) AS tp
         |        FROM qual),
         |agg AS (SELECT doc_id, count(*) AS removed_tokens, list(tp) AS cov
         |        FROM cov GROUP BY doc_id),
         |nsp AS (SELECT doc_id, count(*) AS n_spans_removed FROM qual GROUP BY doc_id)
         |SELECT a.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
         |  a.removed_tokens, n.n_spans_removed,
         |  md5(coalesce(array_to_string(
         |    list_filter(t.toks, (x, i) -> NOT list_contains(a.cov, i)), ' '), '')) AS keep_hash
         |FROM agg a JOIN nsp n USING (doc_id) JOIN th t USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },
    // C8b: the C8 chain with suite-tagged eval grams; removal stays
    // global (qual/cov identical to q_decontaminate), the accounting
    // joins removed positions back to each suite's own gram coverage.
    "q_decontaminate_by" -> {
      val combine5 = {
        import graft.operators.Dedup.ShingleCoef
        (0 until 5).map(k => s"${ShingleCoef(k)} * th[i + $k]").mkString(" + ")
      }
      s"""WITH tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents),
         |th AS (SELECT doc_id, toks, list_transform(toks, t -> ${Hashing.h30Sql("t")}) AS th
         |       FROM tok WHERE len(toks) >= 5),
         |sh AS (SELECT doc_id, i AS pos, $combine5 AS sh
         |       FROM (SELECT doc_id, th, unnest(generate_series(1, len(th) - 4)) AS i
         |             FROM th WHERE doc_id % 10 <> 7) x),
         |eshs AS (SELECT DISTINCT d.source AS suite, g.sh
         |         FROM (SELECT doc_id, $combine5 AS sh
         |               FROM (SELECT doc_id, th, unnest(generate_series(1, len(th) - 4)) AS i
         |                     FROM th WHERE doc_id % 10 = 7) y) g
         |         JOIN documents d USING (doc_id)),
         |esh AS (SELECT DISTINCT sh FROM eshs),
         |dp AS (SELECT DISTINCT s.doc_id, s.pos + o.o AS tp
         |       FROM sh s JOIN esh USING (sh),
         |            (SELECT unnest(generate_series(0, 4)) AS o) o),
         |sp AS (SELECT doc_id, tp,
         |         CASE WHEN lag(tp) OVER w IS NULL OR tp > lag(tp) OVER w + 1
         |              THEN 1 ELSE 0 END AS new_span
         |       FROM dp WINDOW w AS (PARTITION BY doc_id ORDER BY tp)),
         |sid AS (SELECT doc_id, tp,
         |          sum(new_span) OVER (PARTITION BY doc_id ORDER BY tp) AS span_id
         |        FROM sp),
         |spans AS (SELECT doc_id, span_id, min(tp) AS span_start,
         |            count(*) AS span_len
         |          FROM sid GROUP BY doc_id, span_id),
         |qual AS (SELECT * FROM spans WHERE span_len >= 8),
         |cov AS (SELECT doc_id,
         |          unnest(generate_series(span_start, span_start + span_len - 1)) AS tp
         |        FROM qual),
         |scov AS (SELECT DISTINCT s.doc_id, e.suite, s.pos + o.o AS tp
         |         FROM sh s JOIN eshs e USING (sh),
         |              (SELECT unnest(generate_series(0, 4)) AS o) o)
         |SELECT suite, CAST(count(DISTINCT sc.doc_id) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS attributed_tokens
         |FROM scov sc JOIN cov USING (doc_id, tp)
         |GROUP BY suite ORDER BY suite""".stripMargin
    },
    // D7b: same covered-position derivation, then gaps-and-islands span
    // ids, per-span content hash over the token slice, and the
    // span-length distribution.
    "q_dup_substrings" -> {
      val combine5 = {
        import graft.operators.Dedup.ShingleCoef
        (0 until 5).map(k => s"${ShingleCoef(k)} * th[i + $k]").mkString(" + ")
      }
      s"""WITH tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents),
         |th AS (SELECT doc_id, toks, list_transform(toks, t -> ${Hashing.h30Sql("t")}) AS th
         |       FROM tok WHERE len(toks) >= 5),
         |sh AS (SELECT doc_id, i AS pos, $combine5 AS sh
         |       FROM (SELECT doc_id, th, unnest(generate_series(1, len(th) - 4)) AS i FROM th) x),
         |dup AS (SELECT sh FROM sh GROUP BY sh HAVING count(DISTINCT doc_id) >= 2),
         |dp AS (SELECT DISTINCT s.doc_id, s.pos + o.o AS tp
         |       FROM sh s JOIN dup USING (sh),
         |            (SELECT unnest(generate_series(0, 4)) AS o) o),
         |sp AS (SELECT doc_id, tp,
         |         CASE WHEN lag(tp) OVER w IS NULL OR tp > lag(tp) OVER w + 1
         |              THEN 1 ELSE 0 END AS new_span
         |       FROM dp WINDOW w AS (PARTITION BY doc_id ORDER BY tp)),
         |sid AS (SELECT doc_id, tp,
         |          sum(new_span) OVER (PARTITION BY doc_id ORDER BY tp) AS span_id
         |        FROM sp),
         |spans AS (SELECT doc_id, span_id, min(tp) AS span_start,
         |            count(*) AS span_len
         |          FROM sid GROUP BY doc_id, span_id),
         |sph AS (SELECT s.doc_id, s.span_len,
         |          md5(array_to_string(
         |            t.toks[s.span_start : s.span_start + s.span_len - 1], ' ')) AS span_hash
         |        FROM spans s JOIN th t USING (doc_id))
         |SELECT CAST(span_len AS BIGINT) AS span_len, count(*) AS n_spans,
         |  count(DISTINCT doc_id) AS n_docs,
         |  count(DISTINCT span_hash) AS n_substrings
         |FROM sph GROUP BY span_len ORDER BY span_len""".stripMargin
    },
    // D7d: identical chain with the doc's source carried through to a
    // (source, span_len) facet; the dup-gram test stays corpus-global.
    "q_dup_substrings_by" -> {
      val combine5 = {
        import graft.operators.Dedup.ShingleCoef
        (0 until 5).map(k => s"${ShingleCoef(k)} * th[i + $k]").mkString(" + ")
      }
      s"""WITH tok AS (SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents),
         |th AS (SELECT doc_id, source, toks, list_transform(toks, t -> ${Hashing.h30Sql("t")}) AS th
         |       FROM tok WHERE len(toks) >= 5),
         |sh AS (SELECT doc_id, i AS pos, $combine5 AS sh
         |       FROM (SELECT doc_id, th, unnest(generate_series(1, len(th) - 4)) AS i FROM th) x),
         |dup AS (SELECT sh FROM sh GROUP BY sh HAVING count(DISTINCT doc_id) >= 2),
         |dp AS (SELECT DISTINCT s.doc_id, s.pos + o.o AS tp
         |       FROM sh s JOIN dup USING (sh),
         |            (SELECT unnest(generate_series(0, 4)) AS o) o),
         |sp AS (SELECT doc_id, tp,
         |         CASE WHEN lag(tp) OVER w IS NULL OR tp > lag(tp) OVER w + 1
         |              THEN 1 ELSE 0 END AS new_span
         |       FROM dp WINDOW w AS (PARTITION BY doc_id ORDER BY tp)),
         |sid AS (SELECT doc_id, tp,
         |          sum(new_span) OVER (PARTITION BY doc_id ORDER BY tp) AS span_id
         |        FROM sp),
         |spans AS (SELECT doc_id, span_id, min(tp) AS span_start,
         |            count(*) AS span_len
         |          FROM sid GROUP BY doc_id, span_id),
         |sph AS (SELECT t.source, s.doc_id, s.span_len,
         |          md5(array_to_string(
         |            t.toks[s.span_start : s.span_start + s.span_len - 1], ' ')) AS span_hash
         |        FROM spans s JOIN th t USING (doc_id))
         |SELECT source, CAST(span_len AS BIGINT) AS span_len,
         |  count(*) AS n_spans, count(DISTINCT doc_id) AS n_docs,
         |  count(DISTINCT span_hash) AS n_substrings
         |FROM sph GROUP BY source, span_len ORDER BY source, span_len""".stripMargin
    },
    "q_dedup_embed" ->
      s"""WITH $normCte
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS label,
         |  CAST(round(CAST(CAST((list_dot_product(a.v, b.v) / sqrt(a.nrm2 * b.nrm2)) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS cos
         |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE list_dot_product(a.v, b.v) / sqrt(a.nrm2 * b.nrm2) >= 0.3
         |ORDER BY id_a, id_b""".stripMargin,
    // D9: the IVF assignment chain fused with a within-cell lower-id
    // pair join — the whole SemDeDup verdict re-derived in SQL.
    "q_dedup_semantic" ->
      s"""WITH $normCte,
         |$ivfCellsCte,
         |pr AS (SELECT a.vec_id,
         |         list_dot_product(a.v, b.v) / sqrt(a.nrm2 * b.nrm2) AS cos
         |       FROM cells a JOIN cells b
         |         ON a.cell = b.cell AND b.vec_id < a.vec_id),
         |agg AS (SELECT vec_id, count(*) AS n_sim_lower, max(cos) AS mx
         |        FROM pr WHERE cos >= 0.3 GROUP BY 1)
         |SELECT c.vec_id, CAST(c.cell AS BIGINT) AS cell,
         |  CAST(coalesce(g.n_sim_lower, 0) AS BIGINT) AS n_sim_lower,
         |  CAST(CASE WHEN g.n_sim_lower IS NULL THEN 1 ELSE 0 END AS BIGINT)
         |    AS kept,
         |  CAST(round(CAST(CAST((g.mx) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS max_cos_lower
         |FROM cells c LEFT JOIN agg g USING (vec_id)
         |ORDER BY vec_id""".stripMargin,
    // D9b: corpus IVF assignment (proven chain) + the synthesized
    // incoming batch routed onto the same centroids + the incoming x
    // corpus cell-mate pair join, re-derived end-to-end.
    "q_dedup_semantic_inc" ->
      s"""WITH $normCte,
         |$ivfCellsCte,
         |inc AS (SELECT vec_id + 10000 AS vec_id, v FROM n WHERE vec_id % 5 = 0
         |        UNION ALL
         |        SELECT vec_id + 20000 AS vec_id,
         |          list_transform(v, x -> x + 0.25) AS v
         |        FROM n WHERE vec_id % 7 = 3),
         |ni AS (SELECT vec_id, v, list_dot_product(v, v) AS nrm2 FROM inc),
         |adi AS (SELECT ni.vec_id, cc.cell,
         |          ni.nrm2 - 2.0 * list_dot_product(ni.v, cc.cv) + cc.cn AS d
         |        FROM ni, cc),
         |asgi AS (SELECT vec_id, cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY d, cell) AS rn FROM adi)
         |  WHERE rn = 1),
         |icells AS (SELECT ni.vec_id, a.cell, ni.v, ni.nrm2
         |           FROM ni JOIN asgi a USING (vec_id)),
         |pr AS (SELECT a.vec_id, b.vec_id AS cid,
         |         list_dot_product(a.v, b.v) / sqrt(a.nrm2 * b.nrm2) AS cos
         |       FROM icells a JOIN cells b ON a.cell = b.cell),
         |agg AS (SELECT vec_id, min(cid) AS match_id, count(*) AS n_sim,
         |          max(cos) AS mx
         |        FROM pr WHERE cos >= 0.3 GROUP BY 1)
         |SELECT i.vec_id, CAST(i.cell AS BIGINT) AS cell,
         |  CASE WHEN match_id IS NULL THEN 'new' ELSE 'near_dup' END AS status,
         |  match_id, CAST(coalesce(n_sim, 0) AS BIGINT) AS n_sim,
         |  CAST(round(CAST(CAST((mx) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS max_cos
         |FROM icells i LEFT JOIN agg USING (vec_id)
         |ORDER BY vec_id""".stripMargin,
    // E5: the identical md5-derived plane literals (Projection.Salt),
    // the projected dot ladder, and the paired cosines re-derived.
    "q_jl_distortion" -> {
      val planes = graft.operators.Similarity
        .hyperplanes(16, 64, graft.operators.Projection.Salt)
      val projSql = planes.map { p =>
        val arr = p.map(_.toString).mkString("[", ", ", "]")
        s"list_dot_product(v, $arr)"
      }.mkString("[", ",\n         ", "]")
      s"""WITH $normCte,
         |p AS (SELECT vec_id, v, nrm2,
         |        $projSql AS proj FROM n),
         |pp AS (SELECT vec_id, v, nrm2, proj,
         |         list_dot_product(proj, proj) AS pn2 FROM p)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  CAST(round(CAST(CAST((list_dot_product(a.v, b.v) / sqrt(a.nrm2 * b.nrm2)) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS cos_orig,
         |  CAST(round(CAST(CAST((list_dot_product(a.proj, b.proj) / sqrt(a.pn2 * b.pn2)) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS cos_proj,
         |  CAST(round(CAST(CAST((abs(list_dot_product(a.v, b.v) / sqrt(a.nrm2 * b.nrm2)
         |    - list_dot_product(a.proj, b.proj) / sqrt(a.pn2 * b.pn2))) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS abs_err
         |FROM pp a JOIN pp b ON b.vec_id = a.vec_id + 1
         |ORDER BY id_a""".stripMargin
    },
    // E6: the same consecutive pairs, prefix slices (array_slice is
    // 1-based inclusive = Spark slice(v, 1, k)), micro-integer errors.
    "q_mrl_distortion" ->
      s"""WITH $normCte,
         |p AS (SELECT a.vec_id AS id_a, a.v AS va, b.v AS vb,
         |        list_dot_product(a.v, b.v) / sqrt(a.nrm2 * b.nrm2) AS cf
         |      FROM n a JOIN n b ON b.vec_id = a.vec_id + 1),
         |e AS (SELECT ks.k,
         |        CAST(round(CAST(round(CAST(CAST((abs(cf -
         |          list_dot_product(array_slice(va, 1, ks.k), array_slice(vb, 1, ks.k)) /
         |          sqrt(list_dot_product(array_slice(va, 1, ks.k), array_slice(va, 1, ks.k))
         |            * list_dot_product(array_slice(vb, 1, ks.k), array_slice(vb, 1, ks.k)))
         |        )) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) * 1000000) AS BIGINT) AS err_micro
         |      FROM p, (VALUES (CAST(8 AS BIGINT)), (16), (32)) AS ks(k))
         |SELECT k, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(err_micro) AS BIGINT) AS sum_err_micro,
         |  max(err_micro) AS max_err_micro,
         |  CAST(round(CAST(CAST((sum(err_micro) / count(*)) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) AS avg_err_micro
         |FROM e GROUP BY k ORDER BY k""".stripMargin,
    // F1: the identical integer-comparison rule chain, first-fail
    // CASE attribution, and the reached/rate assembly re-derived.
    "q_filter_cascade" ->
      """WITH d AS (SELECT doc_id, text,
        |       regexp_split_to_array(trim(text), '\s+') AS toks,
        |       length(text) AS n_chars,
        |       length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS n_punct,
        |       length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper
        |     FROM documents),
        |s AS (SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS tot_len,
        |  len(list_filter(toks, t -> t IN ('the','a','of','to','and','in','is'))) AS n_stop,
        |  n_punct, n_upper, n_chars FROM d),
        |v AS (SELECT doc_id, CAST(CASE
        |    WHEN NOT coalesce(n_tokens >= 20, FALSE) THEN 0
        |    WHEN NOT coalesce(n_tokens <= 80, FALSE) THEN 1
        |    WHEN NOT coalesce(tot_len >= n_tokens * 2 AND tot_len * 10 <= n_tokens * 45, FALSE) THEN 2
        |    WHEN NOT coalesce(n_stop >= 1, FALSE) THEN 3
        |    WHEN NOT coalesce(n_punct * 5 <= n_chars, FALSE) THEN 4
        |    WHEN NOT coalesce(n_upper * 2 <= n_chars, FALSE) THEN 5
        |    ELSE 6 END AS BIGINT) AS verdict FROM s),
        |c AS (SELECT verdict, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1),
        |rules(rule_no, rule) AS (VALUES (CAST(0 AS BIGINT), 'min_tokens'),
        |  (1, 'max_tokens'), (2, 'avg_token_len'), (3, 'has_stopword'),
        |  (4, 'punct_ratio'), (5, 'upper_ratio'), (6, 'kept')),
        |j AS (SELECT r.rule_no, r.rule, CAST(coalesce(c.c, 0) AS BIGINT) AS c
        |      FROM rules r LEFT JOIN c ON c.verdict = r.rule_no),
        |w AS (SELECT *, CAST(sum(c) OVER () AS BIGINT) AS total,
        |        CAST(coalesce(sum(c) OVER (ORDER BY rule_no
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS bef
        |      FROM j)
        |SELECT rule_no, rule, total - bef AS n_reached,
        |  CASE WHEN rule_no < 6 THEN c ELSE CAST(0 AS BIGINT) END AS n_dropped,
        |  CASE WHEN total - bef > 0
        |    THEN CAST(round(CAST(CAST(((CASE WHEN rule_no < 6 THEN c ELSE 0 END) / (total - bef)) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE)
        |  END AS drop_rate
        |FROM w ORDER BY rule_no""".stripMargin,
    // F2: the same six predicates summed independently in one pass,
    // then pivoted to the per-rule table.
    "q_filter_marginals" ->
      """WITH d AS (SELECT doc_id, text,
        |       regexp_split_to_array(trim(text), '\s+') AS toks,
        |       length(text) AS n_chars,
        |       length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS n_punct,
        |       length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper
        |     FROM documents),
        |s AS (SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS tot_len,
        |  len(list_filter(toks, t -> t IN ('the','a','of','to','and','in','is'))) AS n_stop,
        |  n_punct, n_upper, n_chars FROM d),
        |f AS (SELECT
        |  CAST(sum(CASE WHEN NOT coalesce(n_tokens >= 20, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS f0,
        |  CAST(sum(CASE WHEN NOT coalesce(n_tokens <= 80, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        |  CAST(sum(CASE WHEN NOT coalesce(tot_len >= n_tokens * 2 AND tot_len * 10 <= n_tokens * 45, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS f2,
        |  CAST(sum(CASE WHEN NOT coalesce(n_stop >= 1, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS f3,
        |  CAST(sum(CASE WHEN NOT coalesce(n_punct * 5 <= n_chars, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS f4,
        |  CAST(sum(CASE WHEN NOT coalesce(n_upper * 2 <= n_chars, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS f5,
        |  CAST(count(*) AS BIGINT) AS n FROM s),
        |e(rule_no, rule) AS (VALUES (CAST(0 AS BIGINT), 'min_tokens'),
        |  (1, 'max_tokens'), (2, 'avg_token_len'), (3, 'has_stopword'),
        |  (4, 'punct_ratio'), (5, 'upper_ratio'))
        |SELECT e.rule_no, e.rule,
        |  CASE e.rule_no WHEN 0 THEN f0 WHEN 1 THEN f1 WHEN 2 THEN f2
        |    WHEN 3 THEN f3 WHEN 4 THEN f4 ELSE f5 END AS n_failed,
        |  n AS n_docs,
        |  CASE WHEN n > 0 THEN CAST(round(CAST(CAST(((CASE e.rule_no WHEN 0 THEN f0
        |    WHEN 1 THEN f1 WHEN 2 THEN f2 WHEN 3 THEN f3 WHEN 4 THEN f4
        |    ELSE f5 END) / n) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) END AS fail_rate
        |FROM e, f ORDER BY rule_no""".stripMargin,
    // G2: the G1 chain with the probe rank kept unfiltered and joined
    // to the nprobe value table, against the brute different-label
    // truth — the S6 recall-sweep tail verbatim.
    "q_hard_neg_sweep" ->
      s"""WITH $normCte,
         |$ivfCellsCte,
         |cl AS (SELECT c.vec_id, c.cell, c.v, c.nrm2, n.label
         |       FROM cells c JOIN n ON n.vec_id = c.vec_id),
         |q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv, nrm2 AS qn
         |      FROM n WHERE vec_id < 10),
         |qp AS (SELECT q.query_id, q.qlabel, q.qv, q.qn, cc.cell,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY q.qn - 2.0 * list_dot_product(q.qv, cc.cv) + cc.cn,
         |          cc.cell) AS pr
         |    FROM q, cc),
         |sall AS (SELECT np.np AS nprobe, qp.query_id,
         |        c.vec_id AS neighbor_id,
         |        list_dot_product(qp.qv, c.v) / sqrt(qp.qn * c.nrm2) AS cos
         |      FROM (VALUES (CAST(1 AS BIGINT)), (2), (4)) AS np(np)
         |      JOIN qp ON qp.pr <= np.np
         |      JOIN cl c ON c.cell = qp.cell
         |      WHERE qp.qlabel <> c.label),
         |r AS (SELECT *, row_number() OVER (PARTITION BY nprobe, query_id
         |        ORDER BY cos DESC, neighbor_id) AS rnk FROM sall),
         |hits AS (SELECT nprobe, query_id, neighbor_id FROM r WHERE rnk <= 5),
         |bs AS (SELECT q.query_id, c.vec_id AS neighbor_id,
         |        list_dot_product(q.qv, c.v) / sqrt(q.qn * c.nrm2) AS cos
         |      FROM q JOIN n c ON q.qlabel <> c.label),
         |br AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |        ORDER BY cos DESC, neighbor_id) AS rnk FROM bs),
         |truth AS (SELECT np.np AS nprobe, query_id, neighbor_id
         |      FROM br, (VALUES (CAST(1 AS BIGINT)), (2), (4)) AS np(np)
         |      WHERE rnk <= 5)
         |SELECT t.nprobe, t.query_id, count(*) AS n_true,
         |  CAST(coalesce(sum(CASE WHEN h.neighbor_id IS NOT NULL THEN 1 END), 0)
         |    AS BIGINT) AS n_hit,
         |  coalesce(sum(CASE WHEN h.neighbor_id IS NOT NULL THEN 1 END), 0)
         |    / count(*) AS recall
         |FROM truth t LEFT JOIN hits h
         |  ON t.nprobe = h.nprobe AND t.query_id = h.query_id
         |  AND t.neighbor_id = h.neighbor_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // G1: the proven IVF chain (same cells, same probe order) with
    // the label riding the cell table and filtered before the rank.
    "q_hard_negatives" ->
      s"""WITH $normCte,
         |$ivfCellsCte,
         |cl AS (SELECT c.vec_id, c.cell, c.v, c.nrm2, n.label
         |       FROM cells c JOIN n ON n.vec_id = c.vec_id),
         |q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv, nrm2 AS qn
         |      FROM n WHERE vec_id < 10),
         |qp AS (SELECT query_id, qlabel, qv, qn, cell FROM (
         |    SELECT q.query_id, q.qlabel, q.qv, q.qn, cc.cell,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY q.qn - 2.0 * list_dot_product(q.qv, cc.cv) + cc.cn,
         |          cc.cell) AS pr
         |    FROM q, cc)
         |  WHERE pr <= 4),
         |s AS (SELECT qp.query_id, c.vec_id AS neighbor_id, c.label AS neighbor_label,
         |        list_dot_product(qp.qv, c.v) / sqrt(qp.qn * c.nrm2) AS cos
         |      FROM qp JOIN cl c USING (cell) WHERE qp.qlabel <> c.label),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |        ORDER BY cos DESC, neighbor_id) AS rnk FROM s)
         |SELECT query_id, rnk, neighbor_id, neighbor_label, CAST(round(CAST(CAST((cos) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS cos
         |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
    // V1: the same violated = NOT coalesce(pred, FALSE) semantics per
    // check, the referential as a left join vs distinct customer keys.
    "q_expectations" ->
      """WITH rc AS (SELECT count(*) AS n,
        |    sum(CASE WHEN NOT coalesce(o_orderkey IS NOT NULL, FALSE) THEN 1 ELSE 0 END) AS f0,
        |    sum(CASE WHEN NOT coalesce(o_totalprice > 0, FALSE) THEN 1 ELSE 0 END) AS f1,
        |    sum(CASE WHEN NOT coalesce(o_totalprice <= 300000.0, FALSE) THEN 1 ELSE 0 END) AS f2,
        |    sum(CASE WHEN NOT coalesce(o_orderstatus IN ('O','F','P'), FALSE) THEN 1 ELSE 0 END) AS f3,
        |    sum(CASE WHEN NOT coalesce(regexp_matches(o_orderpriority, '^[1-5]-'), FALSE) THEN 1 ELSE 0 END) AS f4,
        |    sum(CASE WHEN NOT coalesce(o_orderdate BETWEEN TIMESTAMP '1992-01-01'
        |          AND TIMESTAMP '1998-12-31', FALSE) THEN 1 ELSE 0 END) AS f5
        |  FROM orders),
        |ref AS (SELECT count(*) AS n,
        |          sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS f
        |        FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |          ON o.o_custkey = c.c_custkey),
        |u AS (
        |  SELECT 'orderkey_not_null' AS expectation, n AS n_checked, f0 AS n_failed FROM rc
        |  UNION ALL SELECT 'totalprice_positive', n, f1 FROM rc
        |  UNION ALL SELECT 'totalprice_under_cap', n, f2 FROM rc
        |  UNION ALL SELECT 'status_in_domain', n, f3 FROM rc
        |  UNION ALL SELECT 'priority_format', n, f4 FROM rc
        |  UNION ALL SELECT 'orderdate_in_range', n, f5 FROM rc
        |  UNION ALL SELECT 'custkey_referential', n, f FROM ref)
        |SELECT expectation, n_checked, CAST(n_failed AS BIGINT) AS n_failed,
        |  CAST(round(CAST(CAST((CAST(n_failed AS DOUBLE) / n_checked) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS fail_rate,
        |  CAST(CASE WHEN n_checked = 0 THEN NULL
        |    WHEN n_failed = 0 THEN 1 ELSE 0 END AS BIGINT) AS pass
        |FROM u ORDER BY expectation""".stripMargin,
    // C9: eval-side IVF cells (lowest-id seeds over the eval subset),
    // train routed to its 2 nearest cells, train x eval cell-mate
    // cosine — the whole scrubSemantic chain re-derived in SQL.
    "q_decontaminate_sem" ->
      s"""WITH $normCte,
         |ev AS (SELECT vec_id, v, nrm2 FROM n WHERE vec_id % 10 = 7),
         |tr AS (SELECT vec_id, v, nrm2 FROM n WHERE vec_id % 10 <> 7),
         |cc AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         |         v AS cv, nrm2 AS cn
         |       FROM (SELECT vec_id, v, nrm2 FROM ev ORDER BY vec_id LIMIT 8)),
         |ead AS (SELECT ev.vec_id, cc.cell,
         |          ev.nrm2 - 2.0 * list_dot_product(ev.v, cc.cv) + cc.cn AS d
         |        FROM ev, cc),
         |easg AS (SELECT vec_id, cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY d, cell) AS rn FROM ead)
         |  WHERE rn = 1),
         |ecells AS (SELECT ev.vec_id, a.cell, ev.v, ev.nrm2
         |           FROM ev JOIN easg a USING (vec_id)),
         |tp AS (SELECT vec_id, v, nrm2, cell FROM (
         |    SELECT tr.vec_id, tr.v, tr.nrm2, cc.cell,
         |      row_number() OVER (PARTITION BY tr.vec_id
         |        ORDER BY tr.nrm2 - 2.0 * list_dot_product(tr.v, cc.cv) + cc.cn,
         |          cc.cell) AS pr
         |    FROM tr, cc)
         |  WHERE pr <= 2),
         |pr AS (SELECT a.vec_id, b.vec_id AS eid,
         |         list_dot_product(a.v, b.v) / sqrt(a.nrm2 * b.nrm2) AS cos
         |       FROM tp a JOIN ecells b USING (cell)),
         |agg AS (SELECT vec_id, min(eid) AS match_id, count(*) AS n_sim,
         |          max(cos) AS mx
         |        FROM pr WHERE cos >= 0.3 GROUP BY 1)
         |SELECT t.vec_id,
         |  CASE WHEN match_id IS NULL THEN 'clean' ELSE 'contaminated' END
         |    AS status,
         |  match_id, CAST(coalesce(n_sim, 0) AS BIGINT) AS n_sim,
         |  CAST(round(CAST(CAST((mx) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS max_cos
         |FROM tr t LEFT JOIN agg USING (vec_id)
         |ORDER BY vec_id""".stripMargin,
    // E4: the whole fixed-point Lloyd fit unrolled (see
    // kmeansOracleSql) — quantization, seeding, 3 assign/update
    // rounds, final assignment, inertia.
    "q_kmeans" -> kmeansOracleSql(k = 8, iters = 3),
    // P14: bucket counts, the micro-log lambda ladder, and the exact
    // integer document scores re-derived in SQL.
    "q_dsir_select" ->
      s"""WITH d AS (SELECT doc_id, source,
         |       regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents),
         |g AS (SELECT doc_id, source, toks[i] AS gram
         |      FROM (SELECT doc_id, source, toks,
         |              unnest(generate_series(1, len(toks))) AS i FROM d) x
         |      UNION ALL
         |      SELECT doc_id, source, toks[i] || ' ' || toks[i + 1] AS gram
         |      FROM (SELECT doc_id, source, toks,
         |              unnest(generate_series(1, len(toks) - 1)) AS i
         |            FROM d WHERE len(toks) >= 2) y),
         |gb AS (SELECT doc_id, source,
         |         ${Hashing.h30Sql("gram")} % 256 AS bucket FROM g),
         |cnt AS (SELECT bucket, count(*) AS r_b,
         |          count(*) FILTER (WHERE source IN
         |            ('src0', 'src1', 'src2', 'src3')) AS t_b
         |        FROM gb GROUP BY 1),
         |tot AS (SELECT sum(r_b) AS r_tot, sum(t_b) AS t_tot FROM cnt),
         |lam AS (SELECT bucket,
         |          CAST(round(CAST(round(CAST(CAST((ln((t_b + 1.0) / (t_tot + 256.0))) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE)
         |            * 1000000) AS BIGINT)
         |        - CAST(round(CAST(round(CAST(CAST((ln((r_b + 1.0) / (r_tot + 256.0))) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE)
         |            * 1000000) AS BIGINT) AS lam
         |        FROM cnt, tot),
         |sc AS (SELECT doc_id, count(*) AS n_grams,
         |         CAST(sum(lam) AS BIGINT) AS score_micro
         |       FROM gb JOIN lam USING (bucket) GROUP BY 1),
         |nn AS (SELECT count(*) AS n_docs FROM documents),
         |r AS (SELECT doc_id, n_grams, score_micro,
         |        CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id)
         |          AS BIGINT) AS sel_rank
         |      FROM sc)
         |SELECT doc_id, n_grams, score_micro, sel_rank,
         |  CAST(CASE WHEN sel_rank <= (n_docs * 250) // 1000
         |    THEN 1 ELSE 0 END AS BIGINT) AS selected
         |FROM r, nn ORDER BY doc_id""".stripMargin,
    "q_ann_topk" -> annTopkRawSql,
    "q_ann_lsh" -> annLshRawSql,
    // S10: both proven arm chains nested verbatim, the same micro
    // reciprocal ladder, one grouped integer sum, per-query top-5.
    "q_ann_rrf" ->
      s"""WITH lsh AS (SELECT query_id, neighbor_id, rnk FROM ($annLshRawSql)),
         |ivf AS (SELECT query_id, neighbor_id, rnk FROM (${ivfChainSql(4)})),
         |u AS (SELECT * FROM lsh UNION ALL SELECT * FROM ivf),
         |f AS (SELECT query_id, neighbor_id,
         |        CAST(sum(CAST(round(1000000.0 / (60 + rnk), 0) AS BIGINT))
         |          AS BIGINT) AS rrf_micro,
         |        count(*) AS n_arms
         |      FROM u GROUP BY 1, 2),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |        ORDER BY rrf_micro DESC, neighbor_id) AS rnk FROM f)
         |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id,
         |  rrf_micro, CAST(n_arms AS BIGINT) AS n_arms
         |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
    "q_ann_lsh_mp" -> annLshMpSql,
    "q_ann_lsh_mt" -> annLshMtSql,
    "q_ann_ivf" -> ivfChainSql(4),
    // identical selection by design: the streaming serving kernel must
    // pick element-for-element what the batch IVF search picks
    "q_ann_stream_topk" -> ivfChainSql(4),
    // the sweep nests the ivf chain at each probe count plus the brute
    // chain — one definition each, replicated per nprobe
    "q_ann_ivf_sweep" -> {
      val ivfUnion = Seq(1, 2, 4, 8).map { np =>
        s"SELECT CAST($np AS BIGINT) AS nprobe, query_id, neighbor_id FROM (${ivfChainSql(np)})"
      }.mkString("\n  UNION ALL ")
      s"""WITH bn AS (SELECT CAST(np.nprobe AS BIGINT) AS nprobe,
         |       b.query_id, b.neighbor_id
         |     FROM (SELECT unnest([1, 2, 4, 8]) AS nprobe) np,
         |          ($annTopkRawSql) b),
         |iv AS (
         |  $ivfUnion)
         |SELECT bn.nprobe, bn.query_id, count(*) AS n_true,
         |  CAST(coalesce(sum(CASE WHEN iv.neighbor_id IS NOT NULL THEN 1 END), 0)
         |    AS BIGINT) AS n_hit,
         |  coalesce(sum(CASE WHEN iv.neighbor_id IS NOT NULL THEN 1 END), 0)
         |    / count(*) AS recall
         |FROM bn LEFT JOIN iv
         |  ON bn.nprobe = iv.nprobe AND bn.query_id = iv.query_id
         |  AND bn.neighbor_id = iv.neighbor_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    // S9: DuckDB rebuilds the whole PQ pipeline — codebook from the 16
    // lowest-id vectors' slices, per-subspace argmin encode (same
    // reduced |w|^2 - 2<sub,w> objective; the |sub|^2 term is
    // rank-invariant on both engines), then the ADC fold as
    // list_reduce over an s-ORDERED list_transform (== Spark's
    // ascending aggregate; t0 + 0.0 == t0, so the missing init is
    // exact). The codebook flattens s-major into one 128-entry list so
    // the per-candidate lookup is pure indexing, no joins inside the
    // fold.
    "q_ann_pq" ->
      s"""WITH $normCte,
         |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, v AS w
         |       FROM (SELECT vec_id, v FROM n ORDER BY vec_id LIMIT 16)),
         |cw AS (SELECT ss.s, cb.j, cb.w[ss.s*8+1 : ss.s*8+8] AS cw
         |       FROM cb, (SELECT unnest(generate_series(0, 7)) AS s) ss),
         |cwn AS (SELECT s, j, cw, list_dot_product(cw, cw) AS wn FROM cw),
         |enc0 AS (SELECT n.vec_id, c.s, c.j,
         |           c.wn - 2.0 * list_dot_product(n.v[c.s*8+1 : c.s*8+8], c.cw) AS d
         |         FROM n, cwn c),
         |enc AS (SELECT vec_id, s, j AS code FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, s
         |      ORDER BY d, j) AS rn FROM enc0) WHERE rn = 1),
         |codes AS (SELECT vec_id, list(code ORDER BY s) AS codes
         |          FROM enc GROUP BY vec_id),
         |cbl AS (SELECT list(cw ORDER BY s, j) AS flat,
         |               list(wn ORDER BY s, j) AS flatn FROM cwn),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM n WHERE vec_id < 10),
         |est AS (SELECT q.query_id, c.vec_id AS neighbor_id,
         |    list_reduce(list_transform(generate_series(0, 7), s ->
         |      list_dot_product(q.qv[s*8+1 : s*8+8], q.qv[s*8+1 : s*8+8])
         |      - 2.0 * list_dot_product(q.qv[s*8+1 : s*8+8],
         |          b.flat[s*16 + c.codes[s+1] + 1])
         |      + b.flatn[s*16 + c.codes[s+1] + 1]),
         |     (x, y) -> x + y) AS d2
         |  FROM q, codes c, cbl b WHERE q.query_id <> c.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |        ORDER BY d2, neighbor_id) AS rnk FROM est)
         |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id,
         |  CAST(round(CAST(CAST((d2) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS d2est
         |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
    // S9b: IVF routing CTEs (cc/ad/asg/q/qp — verbatim the q_ann_ivf
    // devices at nprobe=4) fused with the PQ codebook/encode CTEs
    // (verbatim q_ann_pq's), candidates restricted to the probed
    // cells, ranked by the same ADC fold.
    "q_ann_ivfpq" ->
      s"""WITH $normCte,
         |cc AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         |         v AS cv, nrm2 AS cn
         |       FROM (SELECT vec_id, v, nrm2 FROM n ORDER BY vec_id LIMIT 16)),
         |ad AS (SELECT n.vec_id, cc.cell,
         |         n.nrm2 - 2.0 * list_dot_product(n.v, cc.cv) + cc.cn AS d
         |       FROM n, cc),
         |asg AS (SELECT vec_id, cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY d, cell) AS rn FROM ad)
         |  WHERE rn = 1),
         |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, v AS w
         |       FROM (SELECT vec_id, v FROM n ORDER BY vec_id LIMIT 16)),
         |cw AS (SELECT ss.s, cb.j, cb.w[ss.s*8+1 : ss.s*8+8] AS cw
         |       FROM cb, (SELECT unnest(generate_series(0, 7)) AS s) ss),
         |cwn AS (SELECT s, j, cw, list_dot_product(cw, cw) AS wn FROM cw),
         |enc0 AS (SELECT n.vec_id, c.s, c.j,
         |           c.wn - 2.0 * list_dot_product(n.v[c.s*8+1 : c.s*8+8], c.cw) AS d
         |         FROM n, cwn c),
         |enc AS (SELECT vec_id, s, j AS code FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, s
         |      ORDER BY d, j) AS rn FROM enc0) WHERE rn = 1),
         |codes AS (SELECT vec_id, list(code ORDER BY s) AS codes
         |          FROM enc GROUP BY vec_id),
         |cbl AS (SELECT list(cw ORDER BY s, j) AS flat,
         |               list(wn ORDER BY s, j) AS flatn FROM cwn),
         |q AS (SELECT vec_id AS query_id, v AS qv, nrm2 AS qn
         |      FROM n WHERE vec_id < 10),
         |qp AS (SELECT query_id, qv, cell FROM (
         |    SELECT q.query_id, q.qv, cc.cell,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY q.qn - 2.0 * list_dot_product(q.qv, cc.cv) + cc.cn,
         |          cc.cell) AS pr
         |    FROM q, cc)
         |  WHERE pr <= 4),
         |cd AS (SELECT a.vec_id, a.cell, c.codes
         |       FROM asg a JOIN codes c USING (vec_id)),
         |est AS (SELECT qp.query_id, cd.vec_id AS neighbor_id,
         |    list_reduce(list_transform(generate_series(0, 7), s ->
         |      list_dot_product(qp.qv[s*8+1 : s*8+8], qp.qv[s*8+1 : s*8+8])
         |      - 2.0 * list_dot_product(qp.qv[s*8+1 : s*8+8],
         |          b.flat[s*16 + cd.codes[s+1] + 1])
         |      + b.flatn[s*16 + cd.codes[s+1] + 1]),
         |     (x, y) -> x + y) AS d2
         |  FROM qp JOIN cd USING (cell), cbl b
         |  WHERE qp.query_id <> cd.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |        ORDER BY d2, neighbor_id) AS rnk FROM est)
         |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id,
         |  CAST(round(CAST(CAST((d2) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS d2est
         |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
    "q_split" -> {
      val b = graft.operators.Sampling.bucketOfSql("doc_id", "split", 100)
      s"""SELECT doc_id, lang,
         |  CASE WHEN $b < 80 THEN 'train'
         |       WHEN $b < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    // T14: DuckDB re-trains BPE end-to-end — the k stages unroll into
    // k CTE triples (pair counts via the unnest device, argmax with
    // the same (c DESC, l, r) total order, the merge applied by
    // Bpe.mergeFoldSql's list_reduce — the Spark fold's SQL twin,
    // learning l/r from the cross-joined 1-row argmax CTE).
    "q_bpe_merges" -> {
      val sel = (1 to 8).map(i =>
        s"""SELECT $i AS iter, l AS "left", r AS "right",
           |  CAST(c AS BIGINT) AS pair_count FROM b$i""".stripMargin)
        .mkString("\nUNION ALL ")
      s"WITH ${bpeChainCtes(8)}\n$sel\nORDER BY iter"
    },
    // T14b: the re-trained chain's final w8 state IS the segmented
    // vocabulary — gated word-for-word.
    "q_bpe_segment" ->
      s"""WITH ${bpeChainCtes(8)}
         |SELECT word, syms, wc FROM w8 ORDER BY word""".stripMargin,
    // P9: the identical hash-order row_number cut. NULL sources form
    // one partition on both sides (keyOf's sentinel vs SQL's NULL
    // group — same grouping, no real source collides with either).
    "q_quota_sample" -> QuotaSampleOracleSql,
    // P9-RS: the bucket-kernel arm's contract is set equality with the
    // window form, so BOTH keys bind the ONE oracle constant — a
    // duplicated string could drift and silently weaken the RS gate.
    "q_quota_sample_rs" -> QuotaSampleOracleSql,
    // C2: the same all-integer ladder — sums CAST back to BIGINT
    // (DuckDB widens sum(BIGINT) to HUGEINT), products exact in 64-bit
    // at gate scale, the one division on DOUBLEs on both engines.
    "q_drift_ks" ->
      """WITH a AS (SELECT event_type, value AS v, count(*) AS c1 FROM events
        |           WHERE event_id % 2 = 0 AND value IS NOT NULL GROUP BY 1, 2),
        |b AS (SELECT event_type, value AS v, count(*) AS c2 FROM events
        |      WHERE event_id % 2 <> 0 AND value IS NOT NULL GROUP BY 1, 2),
        |m AS (SELECT coalesce(a.event_type, b.event_type) AS event_type,
        |        coalesce(a.v, b.v) AS v,
        |        coalesce(c1, 0) AS c1, coalesce(c2, 0) AS c2
        |      FROM a FULL OUTER JOIN b
        |        ON a.event_type = b.event_type AND a.v = b.v),
        |c AS (SELECT event_type,
        |        CAST(sum(c1) OVER (PARTITION BY event_type ORDER BY v) AS BIGINT) AS cuma,
        |        CAST(sum(c2) OVER (PARTITION BY event_type ORDER BY v) AS BIGINT) AS cumb,
        |        CAST(sum(c1) OVER (PARTITION BY event_type) AS BIGINT) AS na,
        |        CAST(sum(c2) OVER (PARTITION BY event_type) AS BIGINT) AS nb
        |      FROM m)
        |SELECT event_type, max(na) AS n_a, max(nb) AS n_b,
        |  max(abs(cuma * nb - cumb * na)) AS d_num,
        |  CAST(max(abs(cuma * nb - cumb * na)) AS DOUBLE)
        |    / CAST(max(na) * max(nb) AS DOUBLE) AS ks
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    // C2b: the C2 integer ladder over C3's reference-range bins.
    "q_drift_ks_binned" -> {
      val bin = Drift.psiBinSql("e.value", "mn", "mx", 10)
      """WITH rs AS (SELECT event_type, min(value) AS mn, max(value) AS mx
        |            FROM events WHERE event_id % 2 = 0 AND value IS NOT NULL
        |            GROUP BY 1),
        |bb AS (SELECT e.event_type, BINEXPR AS bin,
        |         CAST(sum(CASE WHEN e.event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |         CAST(sum(CASE WHEN e.event_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |       FROM events e JOIN rs USING (event_type)
        |       WHERE e.value IS NOT NULL GROUP BY 1, 2),
        |c AS (SELECT event_type,
        |        CAST(sum(ca) OVER (PARTITION BY event_type ORDER BY bin) AS BIGINT) AS cuma,
        |        CAST(sum(cb) OVER (PARTITION BY event_type ORDER BY bin) AS BIGINT) AS cumb,
        |        CAST(sum(ca) OVER (PARTITION BY event_type) AS BIGINT) AS na,
        |        CAST(sum(cb) OVER (PARTITION BY event_type) AS BIGINT) AS nb
        |      FROM bb)
        |SELECT event_type, max(na) AS n_ref, max(nb) AS n_cur,
        |  max(abs(cuma * nb - cumb * na)) AS d_num,
        |  CAST(max(abs(cuma * nb - cumb * na)) AS DOUBLE)
        |    / CAST(max(na) * max(nb) AS DOUBLE) AS ks
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin
        .replace("BINEXPR", bin)
    },
    // C3: bins via Drift.psiBinSql (the shared expression), smoothing
    // constants CAST to DOUBLE so DuckDB's decimal literals never
    // enter (Spark computes in doubles); psi summed in bin order.
    "q_drift_psi" -> {
      val bin = Drift.psiBinSql("e.value", "mn", "mx", 10)
      """WITH rs AS (SELECT event_type, min(value) AS mn, max(value) AS mx
        |            FROM events WHERE event_id % 2 = 0 AND value IS NOT NULL
        |            GROUP BY 1),
        |r AS (SELECT e.event_type, BINEXPR AS bin, count(*) AS c_ref
        |      FROM events e JOIN rs USING (event_type)
        |      WHERE e.event_id % 2 = 0 AND e.value IS NOT NULL GROUP BY 1, 2),
        |c AS (SELECT e.event_type, BINEXPR AS bin, count(*) AS c_cur
        |      FROM events e JOIN rs USING (event_type)
        |      WHERE e.event_id % 2 <> 0 AND e.value IS NOT NULL GROUP BY 1, 2),
        |m AS (SELECT coalesce(r.event_type, c.event_type) AS event_type,
        |        coalesce(r.bin, c.bin) AS bin,
        |        coalesce(c_ref, 0) AS c_ref, coalesce(c_cur, 0) AS c_cur
        |      FROM r FULL OUTER JOIN c
        |        ON r.event_type = c.event_type AND r.bin = c.bin),
        |t AS (SELECT event_type, bin, c_ref, c_cur,
        |        CAST(sum(c_ref) OVER (PARTITION BY event_type) AS BIGINT) AS n_ref,
        |        CAST(sum(c_cur) OVER (PARTITION BY event_type) AS BIGINT) AS n_cur
        |      FROM m),
        |p AS (SELECT *,
        |        (c_ref + CAST(0.0001 AS DOUBLE))
        |          / (n_ref + CAST(0.0001 AS DOUBLE) * 10) AS p,
        |        (c_cur + CAST(0.0001 AS DOUBLE))
        |          / (n_cur + CAST(0.0001 AS DOUBLE) * 10) AS q
        |      FROM t)
        |SELECT event_type, bin, c_ref, c_cur, n_ref, n_cur,
        |  CAST(round(CAST(CAST((sum((p - q) * ln(p / q)) OVER (PARTITION BY event_type
        |    ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND UNBOUNDED FOLLOWING)) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS psi
        |FROM p ORDER BY event_type, bin""".stripMargin
        .replace("BINEXPR", bin)
    },
    "q_dedup_incremental" -> {
      val combine3 = {
        import graft.operators.Dedup.ShingleCoef
        (0 until 3).map(k => s"${ShingleCoef(k)} * th[i + $k]").mkString(" + ")
      }
      val sideBands = (0 until Dedup.MinhashK / Dedup.BandRows).map { j =>
        val parts = (0 until Dedup.BandRows)
          .map(k => s"mh_${Dedup.BandRows * j + k}::VARCHAR")
          .mkString(" || '_' || ")
        s"SELECT side, doc_id, $j AS band, md5($parts) AS bh FROM mh"
      }.mkString("\n  UNION ALL ")
      s"""WITH inc AS (
         |  SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
         |  UNION ALL
         |  SELECT doc_id + 3000000, text || ' zzappended' FROM documents WHERE doc_id % 10 = 1
         |  UNION ALL
         |  SELECT doc_id + 4000000,
         |    'qqa' || CAST(doc_id AS VARCHAR) || ' qqb' || CAST(doc_id AS VARCHAR)
         |      || ' qqc' || CAST(doc_id AS VARCHAR) || ' qqd' || CAST(doc_id AS VARCHAR)
         |  FROM documents WHERE doc_id % 10 = 2),
         |ad AS (SELECT 0 AS side, doc_id, text FROM documents
         |       UNION ALL SELECT 1, doc_id, text FROM inc),
         |tok AS (SELECT side, doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM ad),
         |th AS (SELECT side, doc_id, list_transform(toks, t -> ${Hashing.h30Sql("t")}) AS th
         |       FROM tok WHERE len(toks) >= 3),
         |sh AS (SELECT DISTINCT side, doc_id, $combine3 AS sh
         |       FROM (SELECT side, doc_id, th,
         |             unnest(generate_series(1, len(th) - 2)) AS i FROM th) x),
         |sz AS (SELECT side, doc_id, count(*) AS n FROM sh GROUP BY 1, 2),
         |mh AS (SELECT side, doc_id,
         |       $minhashSelect
         |  FROM sh GROUP BY side, doc_id),
         |bands AS (
         |  $sideBands),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |         FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh
         |         WHERE x.side = 1 AND y.side = 0),
         |pr AS (SELECT c.doc_a, c.doc_b, count(*) AS shared
         |       FROM cand c
         |       JOIN sh a ON a.side = 1 AND a.doc_id = c.doc_a
         |       JOIN sh b ON b.side = 0 AND b.doc_id = c.doc_b AND b.sh = a.sh
         |       GROUP BY 1, 2),
         |near AS (SELECT p.doc_a AS doc_id, min(p.doc_b) AS near_match
         |         FROM pr p
         |         JOIN sz sa ON sa.side = 1 AND sa.doc_id = p.doc_a
         |         JOIN sz sb ON sb.side = 0 AND sb.doc_id = p.doc_b
         |         WHERE 3 * p.shared >= sa.n + sb.n GROUP BY 1),
         |exh AS (SELECT md5(text) AS h, min(doc_id) AS exact_match
         |        FROM documents GROUP BY 1),
         |ex AS (SELECT i.doc_id, e.exact_match
         |       FROM inc i LEFT JOIN exh e ON md5(i.text) = e.h)
         |SELECT ex.doc_id AS doc_id,
         |  CASE WHEN ex.exact_match IS NOT NULL THEN 'dup_exact'
         |       WHEN nr.near_match IS NOT NULL THEN 'near_dup'
         |       ELSE 'new' END AS status,
         |  coalesce(ex.exact_match, nr.near_match) AS match_id
         |FROM ex LEFT JOIN near nr ON ex.doc_id = nr.doc_id
         |ORDER BY ex.doc_id""".stripMargin
    },
    "q_snapshot_diff" ->
      """WITH nextv AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 1 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 5000000, text FROM documents WHERE doc_id % 7 = 2),
        |p AS (SELECT doc_id, md5(text) AS ph FROM documents),
        |n AS (SELECT doc_id, md5(text) AS nh FROM nextv)
        |SELECT coalesce(p.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN p.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN p.ph <> n.nh THEN 'changed'
        |       ELSE 'unchanged' END AS change
        |FROM p FULL OUTER JOIN n ON p.doc_id = n.doc_id
        |ORDER BY doc_id""".stripMargin,
    "q_normalize" ->
      s"""WITH r AS (SELECT doc_id,
         |    '  NOISY' || chr(9) || '—Block' || chr(160)
         |      || CAST(doc_id % 7 AS VARCHAR)
         |      || '–END' || chr(1) || '  ' || text AS raw
         |  FROM documents),
         |n AS (SELECT doc_id, CAST(length(raw) AS BIGINT) AS raw_len,
         |    trim(regexp_replace(regexp_replace(
         |      translate(lower(raw), '—–', '--'),
         |      '[\\x00-\\x1f\\x7f]', ' ', 'g'),
         |      '[\\s ]+', ' ', 'g')) AS norm
         |  FROM r)
         |SELECT doc_id, raw_len, CAST(length(norm) AS BIGINT) AS norm_len,
         |  md5(norm) AS norm_hash
         |FROM n ORDER BY doc_id""".stripMargin,
    "q_vocab" ->
      """WITH tok AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |  FROM documents),
        |c AS (SELECT token, count(*) AS n FROM tok GROUP BY 1 HAVING count(*) >= 2)
        |SELECT token, n, row_number() OVER (ORDER BY n DESC, token) - 1 AS token_id
        |FROM c ORDER BY token_id""".stripMargin,
    "q_line_dedup" ->
      """WITH raw AS (SELECT doc_id,
        |    'home | about | contact' || chr(10) ||
        |    'section ' || CAST(doc_id % 7 AS VARCHAR) || chr(10) ||
        |    text || chr(10) ||
        |    'copyright 2026 example.org' AS raw
        |  FROM documents),
        |ls AS (SELECT doc_id, regexp_split_to_array(raw, chr(10)) AS a FROM raw),
        |lines AS (SELECT doc_id, i AS line_no, a[i] AS line,
        |    md5(trim(a[i])) AS h
        |  FROM (SELECT doc_id, a, unnest(generate_series(1, len(a))) AS i FROM ls) x),
        |hot AS (SELECT h FROM lines WHERE trim(line) <> ''
        |  GROUP BY h HAVING count(DISTINCT doc_id) >= 2)
        |SELECT doc_id,
        |  count(*) AS n_lines,
        |  CAST(count(*) FILTER (WHERE h IN (SELECT h FROM hot)) AS BIGINT)
        |    AS n_dropped,
        |  ((20000 * count(*) FILTER (WHERE h IN (SELECT h FROM hot))
        |    + count(*)) // (2 * count(*))) / 10000.0 AS dup_line_frac,
        |  md5(coalesce(string_agg(line, chr(10) ORDER BY line_no)
        |    FILTER (WHERE h NOT IN (SELECT h FROM hot)), '')) AS kept_hash
        |FROM lines GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_lm_score" ->
      """WITH tok AS (SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
        |bg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
        |  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
        |        FROM tok WHERE len(toks) >= 2) x),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_bigrams,
        |    CAST(coalesce(sum(CASE WHEN c12 IS NULL THEN 1 END), 0) AS BIGINT)
        |      AS n_oov,
        |    coalesce(sum(CAST(round(CAST(round(CAST(CAST((ln(CAST(c12 AS DOUBLE) / c1)) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE)
        |      * 1000000) AS BIGINT)), 0) AS s
        |  FROM bg
        |  LEFT JOIN c12 USING (w1, w2)
        |  LEFT JOIN c1 USING (w1)
        |  GROUP BY doc_id)
        |SELECT doc_id, n_bigrams, n_oov,
        |  (CASE WHEN s < 0 THEN -1 ELSE 1 END *
        |    ((2 * abs(s) + 100 * (n_bigrams - n_oov))
        |      // (200 * (n_bigrams - n_oov)))) / 10000.0 AS avg_logprob
        |FROM agg ORDER BY doc_id""".stripMargin,
    "q_tfidf" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dfc AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id, token, tf, df,
        |  CAST(round(CAST(CAST((ln(CAST(n_docs AS DOUBLE) / df)) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS idf,
        |  CAST(round(CAST(CAST((tf * CAST(round(CAST(CAST((ln(CAST(n_docs AS DOUBLE) / df)) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE)) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) AS tfidf
        |FROM tf JOIN dfc USING (token) CROSS JOIN n
        |WHERE tf >= 2 AND df >= 2
        |ORDER BY doc_id, token""".stripMargin,
    // T21: the identical ASCII regex classes and the identical single
    // IEEE expression, literal-for-literal.
    "q_readability" ->
      """WITH c AS (SELECT doc_id,
        |        CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |          AS n_words,
        |        CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)
        |          AS n_sentences,
        |        CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
        |          AS n_syllables
        |      FROM documents),
        |g AS (SELECT *, greatest(n_sentences, 1) AS s1 FROM c)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  CASE WHEN n_words > 0 THEN
        |    CAST(round(CAST(CAST((CAST(n_words AS DOUBLE) / CAST(s1 AS DOUBLE)) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE)
        |  END AS words_per_sentence,
        |  CASE WHEN n_words > 0 THEN
        |    CAST(round(CAST(CAST((CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE)
        |  END AS syllables_per_word,
        |  CASE WHEN n_words > 0 THEN
        |    CAST(round(CAST(CAST((206.835
        |      - 1.015 * (CAST(n_words AS DOUBLE) / CAST(s1 AS DOUBLE))
        |      - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))) AS VARCHAR) AS DECIMAL(38,18)),
        |      4) AS DOUBLE)
        |  END AS flesch
        |FROM g ORDER BY doc_id""".stripMargin,
    // T19: the identical ln-micro ladder (round(round(ln,6)*1e6)),
    // HUGEINT sums, and the two final IEEE divisions.
    "q_entropy" ->
      """WITH tok AS (SELECT source, unnest(
        |        regexp_split_to_array(trim(text), '\s+')) AS token
        |      FROM documents),
        |c AS (SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2),
        |g AS (SELECT source,
        |        CAST(sum(c) AS BIGINT) AS n_tokens,
        |        count(*) AS n_types,
        |        CAST(sum(CAST(c AS HUGEINT) *
        |          CAST(CAST(round(CAST(round(CAST(CAST((ln(CAST(c AS DOUBLE))) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) * 1000000, 0)
        |            AS BIGINT) AS HUGEINT)) AS HUGEINT) AS s
        |      FROM c GROUP BY 1),
        |n AS (SELECT *,
        |        CAST(CAST(round(CAST(round(CAST(CAST((ln(CAST(n_tokens AS DOUBLE))) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) * 1000000, 0)
        |          AS BIGINT) AS HUGEINT) * CAST(n_tokens AS HUGEINT) - s AS num,
        |        CAST(CAST(round(CAST(round(CAST(CAST((ln(CAST(n_types AS DOUBLE))) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) * 1000000, 0)
        |          AS BIGINT) AS HUGEINT) AS lnm_t
        |      FROM g)
        |SELECT source, n_tokens, n_types,
        |  CAST(round(CAST(CAST((CAST(num AS DOUBLE)
        |    / CAST(CAST(n_tokens AS HUGEINT) * 1000000 AS DOUBLE)) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE)
        |    AS entropy_nats,
        |  CASE WHEN n_types > 1 THEN
        |    CAST(round(CAST(CAST((CAST(num AS DOUBLE)
        |      / CAST(CAST(n_tokens AS HUGEINT) * lnm_t AS DOUBLE)) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE)
        |  END AS norm_entropy
        |FROM n ORDER BY source""".stripMargin,
    // T18: identical counts (unigram, adjacent-bigram, totals) and the
    // identical lift expression — HUGEINT products, one IEEE division.
    "q_collocations" ->
      """WITH d AS (SELECT regexp_split_to_array(trim(text), '\s+') AS ts
        |       FROM documents),
        |uni AS (SELECT token, count(*) AS n FROM (
        |          SELECT unnest(ts) AS token FROM d) GROUP BY 1),
        |bi AS (SELECT tok_a, tok_b, count(*) AS n_ab FROM (
        |         SELECT ts[i] AS tok_a, ts[i + 1] AS tok_b
        |         FROM (SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i
        |               FROM d WHERE len(ts) >= 2))
        |       GROUP BY 1, 2 HAVING count(*) >= 5),
        |tot AS (SELECT CAST(sum(len(ts)) AS HUGEINT) AS n_tok,
        |          CAST(sum(greatest(len(ts) - 1, 0)) AS HUGEINT) AS n_bi
        |        FROM d)
        |SELECT bi.tok_a, bi.tok_b, bi.n_ab, a.n AS n_a, b.n AS n_b,
        |  CAST(round(CAST(CAST((CAST(CAST(bi.n_ab AS HUGEINT) * n_tok * n_tok AS DOUBLE)
        |    / CAST(n_bi * CAST(a.n AS HUGEINT) * CAST(b.n AS HUGEINT)
        |        AS DOUBLE)) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS lift
        |FROM bi JOIN uni a ON bi.tok_a = a.token
        |        JOIN uni b ON bi.tok_b = b.token
        |        CROSS JOIN tot
        |ORDER BY tok_a, tok_b""".stripMargin,
    "q_shuffle" ->
      """SELECT doc_id, lang,
        |  row_number() OVER (
        |    ORDER BY md5('shuffle_' || CAST(doc_id AS VARCHAR)), doc_id) - 1
        |    AS shuffle_rank
        |FROM documents ORDER BY shuffle_rank""".stripMargin,
    "q_sample" -> {
      // coalesce mirrors Sampling.keyOf's NUL-sentinel: a null stratum
      // must sample like any other, and a null-propagating || would
      // silently drop it (green today only because the corpus has no
      // null lang — the mirror keeps the twin honest if that changes)
      val b = graft.operators.Sampling.bucketOfSql(
        "coalesce(lang, chr(0) || 'null') || '|' || CAST(doc_id AS VARCHAR)",
        "sample", 1000)
      s"""SELECT doc_id, lang FROM documents
         |WHERE $b < 100 ORDER BY doc_id""".stripMargin
    },
    "q_weighted_sample" -> {
      // mirrors Sampling.weightedProfile/weightedFilter operation for
      // operation: clamped weight, exact decimal sum rounded to scale
      // 6 before the double cast, (targetFrac * n) / wsum association,
      // floor(1e6 * min(1, w * scale)) threshold
      // e-notation literals (1e6, 5e2...) are DOUBLEs in DuckDB —
      // bare 500.0 / 0.25 would parse as DECIMAL and make the
      // division exact-decimal instead of the Spark side's IEEE step
      val w = "greatest(coalesce(CAST(least(n_chars, 500) AS DOUBLE)" +
        " / 5e2, 0e0), 0e0)"
      val b = Sampling.bucketOfSql("doc_id", "wsample", 1000000)
      s"""WITH p AS (SELECT (2.5e-1 * count(*)) /
         |    CAST(round(sum(CAST($w AS DECIMAL(38,6))), 6) AS DOUBLE)
         |    AS scale
         |  FROM documents)
         |SELECT doc_id, source, n_chars
         |FROM documents CROSS JOIN p
         |WHERE $b < CAST(floor(1e6 * least(1e0, $w * scale))
         |  AS BIGINT)
         |ORDER BY doc_id""".stripMargin
    },
    "q_contamination" -> {
      val b = Sampling.bucketOfSql("doc_id", "split", 100)
      val combine5 = {
        import graft.operators.Dedup.ShingleCoef
        (0 until 5).map(k => s"${ShingleCoef(k)} * th[i + $k]").mkString(" + ")
      }
      s"""WITH d AS (SELECT doc_id, text,
         |       CASE WHEN $b < 80 THEN 'train'
         |            WHEN $b < 90 THEN 'val' ELSE 'test' END AS split
         |     FROM documents),
         |tok AS (SELECT doc_id, split,
         |        regexp_split_to_array(trim(text), '\\s+') AS toks FROM d),
         |th AS (SELECT doc_id, split, list_transform(toks, t -> ${Hashing.h30Sql("t")}) AS th
         |       FROM tok WHERE len(toks) >= 5),
         |sh AS (SELECT DISTINCT doc_id, split, $combine5 AS sh
         |       FROM (SELECT doc_id, split, th,
         |             unnest(generate_series(1, len(th) - 4)) AS i FROM th) x),
         |tr AS (SELECT DISTINCT sh FROM sh WHERE split = 'train'),
         |te AS (SELECT doc_id, sh FROM sh WHERE split = 'test'),
         |j AS (SELECT te.doc_id, count(*) AS n_shingles,
         |        CAST(sum(CASE WHEN tr.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
         |      FROM te LEFT JOIN tr ON te.sh = tr.sh GROUP BY te.doc_id)
         |SELECT doc_id, n_shingles, n_hit,
         |  CAST(round(CAST(CAST((n_hit / n_shingles) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) AS overlap_frac,
         |  (n_hit * 5 >= n_shingles * 1) AS contaminated
         |FROM j ORDER BY doc_id""".stripMargin
    },
    "q_contamination_by" -> {
      val b = Sampling.bucketOfSql("doc_id", "split", 100)
      val combine5 = {
        import graft.operators.Dedup.ShingleCoef
        (0 until 5).map(k => s"${ShingleCoef(k)} * th[i + $k]").mkString(" + ")
      }
      s"""WITH d AS (SELECT doc_id, text, source,
         |       CASE WHEN $b < 80 THEN 'train'
         |            WHEN $b < 90 THEN 'val' ELSE 'test' END AS split
         |     FROM documents),
         |tok AS (SELECT doc_id, split, source,
         |        regexp_split_to_array(trim(text), '\\s+') AS toks FROM d),
         |th AS (SELECT doc_id, split, source, list_transform(toks, t -> ${Hashing.h30Sql("t")}) AS th
         |       FROM tok WHERE len(toks) >= 5),
         |sh AS (SELECT DISTINCT doc_id, split, source, $combine5 AS sh
         |       FROM (SELECT doc_id, split, source, th,
         |             unnest(generate_series(1, len(th) - 4)) AS i FROM th) x),
         |tr AS (SELECT DISTINCT sh FROM sh WHERE split = 'train'),
         |te AS (SELECT doc_id, source, sh FROM sh WHERE split = 'test'),
         |tot AS (SELECT source, count(*) AS n_total FROM d
         |        WHERE split = 'test' GROUP BY source),
         |j AS (SELECT te.doc_id, te.source, count(*) AS n_sh,
         |        CAST(sum(CASE WHEN tr.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
         |      FROM te LEFT JOIN tr ON te.sh = tr.sh GROUP BY te.doc_id, te.source),
         |r AS (SELECT source AS suite, count(*) AS n_docs,
         |        CAST(sum(CASE WHEN n_hit * 5 >= n_sh * 1 THEN 1 ELSE 0 END) AS BIGINT)
         |          AS n_contaminated,
         |        CAST(sum(n_sh) AS BIGINT) AS n_shingles,
         |        CAST(sum(n_hit) AS BIGINT) AS n_hit,
         |        floor(sum(n_hit) / sum(n_sh) * 10000) / 10000 AS overlap_frac
         |      FROM j GROUP BY source)
         |SELECT r.suite, r.n_docs,
         |  CAST(coalesce(tot.n_total, 0) - r.n_docs AS BIGINT) AS n_docs_skipped,
         |  r.n_contaminated, r.n_shingles, r.n_hit, r.overlap_frac
         |FROM r LEFT JOIN tot ON r.suite IS NOT DISTINCT FROM tot.source
         |ORDER BY r.suite""".stripMargin
    },
    "q_embed_cartography" ->
      """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |d AS (SELECT label, i - 1 AS dim, v[i] AS x
        |      FROM (SELECT label, v, unnest(generate_series(1, len(v))) AS i FROM v) t),
        |c AS (SELECT label, dim,
        |        CAST(round(sum(CAST(x AS DECIMAL(28,10))), 6) AS DOUBLE) / count(x) AS comp
        |      FROM d GROUP BY 1, 2),
        |cent AS (SELECT label, list(comp ORDER BY dim) AS cv FROM c GROUP BY label),
        |cn AS (SELECT label, cv,
        |        CAST(round(CAST(CAST((sqrt(list_dot_product(cv, cv))) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS centroid_norm FROM cent),
        |m AS (SELECT v.label, CAST(round(CAST(CAST((list_dot_product(v.v, cn.cv)
        |          / sqrt(list_dot_product(v.v, v.v) * list_dot_product(cn.cv, cn.cv))) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS cos,
        |        len(v.v) AS dim, cn.centroid_norm
        |      FROM v JOIN cn USING (label))
        |SELECT label, count(*) AS n_vecs, CAST(max(dim) AS BIGINT) AS dim,
        |  max(centroid_norm) AS centroid_norm,
        |  CAST(round(CAST(CAST((CAST(round(sum(CAST(cos AS DECIMAL(28,10))), 6) AS DOUBLE) / count(cos)) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) AS avg_cos,
        |  min(cos) AS min_cos
        |FROM m GROUP BY label ORDER BY label""".stripMargin,
    "q_embed_quant" -> {
      val codeOf = (x: String) =>
        s"greatest(-127.0, least(127.0, round(($x) / scale, 0)))"
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |a AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS amax FROM v),
         |sc AS (SELECT vec_id, v, amax, amax / 127.0 AS scale FROM a)
         |SELECT vec_id, CAST(len(v) AS BIGINT) AS dim,
         |  CAST(round(CAST(CAST((scale) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS scale,
         |  CASE WHEN amax = 0 THEN CAST(0 AS BIGINT)
         |       ELSE CAST(len(list_filter(v, x -> abs(${codeOf("x")}) >= 127.0)) AS BIGINT)
         |  END AS n_sat,
         |  CASE WHEN amax = 0 THEN 0.0
         |       ELSE CAST(round(CAST(CAST((list_max(list_transform(v,
         |              x -> abs(x - ${codeOf("x")} * scale)))) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE)
         |  END AS max_abs_err
         |FROM sc ORDER BY vec_id""".stripMargin
    },
    "q_text_stats" ->
      s"""WITH $tokCte,
         |s AS (SELECT doc_id,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
         |  CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS tot_len,
         |  len(list_filter(toks, t -> t IN ('the','a','of','to','and','in','is'))) AS n_stop,
         |  length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS n_punct,
         |  length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper,
         |  length(text) AS n_chars
         | FROM d)
         |SELECT doc_id, n_tokens, n_distinct,
         |  CAST(round(CAST(CAST((tot_len / n_tokens) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) AS avg_token_len,
         |  CAST(round(CAST(CAST((n_stop / n_tokens) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) AS stop_ratio,
         |  CAST(round(CAST(CAST((n_punct / n_chars) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) AS punct_ratio,
         |  CAST(round(CAST(CAST((n_upper / n_chars) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) AS upper_ratio,
         |  CAST(round(CAST(CAST((least(1.0, n_tokens / 100.0) * (1.0 - n_punct / n_chars)
         |        * (1.0 - n_stop / n_tokens)) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) AS quality
         |FROM s ORDER BY doc_id""".stripMargin,
    "q_langid" -> {
      val caseExpr = "CASE bucket WHEN 0 THEN 'en' WHEN 1 THEN 'es' " +
        "WHEN 2 THEN 'de' WHEN 3 THEN 'fr' ELSE 'zh' END"
      s"""WITH $tokCte,
         |t AS (SELECT doc_id, lang, unnest(toks) AS tok FROM d),
         |c AS (SELECT doc_id, lang, ${h60("tok")} % 5 AS bucket, count(*) AS c
         |      FROM t GROUP BY 1, 2, 3),
         |r AS (SELECT *, sum(c) OVER (PARTITION BY doc_id) AS n_tokens,
         |        row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, bucket) AS rn
         |      FROM c)
         |SELECT doc_id, $caseExpr AS pred_lang,
         |  CAST(round(CAST(CAST((c / n_tokens) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) AS confidence, lang,
         |  ($caseExpr = lang) AS is_match
         |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin
    },
    "q_token_count" ->
      s"""SELECT source, count(*) AS n_docs,
         |  CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS ws_tokens,
         |  CAST(sum(len(regexp_extract_all(text, '$bpeRegexSql'))) AS BIGINT) AS bpe_tokens,
         |  CAST(round(CAST(CAST((avg(len(regexp_extract_all(text, '$bpeRegexSql')))) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) AS avg_bpe_per_doc
         |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_seq_pack" ->
      s"""WITH d AS (SELECT doc_id, source,
         |       CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
         |     FROM documents),
         |w AS (SELECT doc_id, source AS shard, n_tokens,
         |       CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS end_off
         |     FROM d)
         |SELECT doc_id, shard, n_tokens,
         |  end_off - n_tokens AS start_off,
         |  (end_off - n_tokens) // 128 AS first_pack,
         |  (end_off - 1) // 128 AS last_pack,
         |  (end_off - n_tokens) % 128 AS pack_offset
         |FROM w ORDER BY doc_id""".stripMargin,
    "q_source_mix" -> {
      val caseExpr = MixShares
        .map { case (s, w) => s"WHEN '$s' THEN CAST($w AS DOUBLE)" }
        .mkString("CASE d.source ", " ", s" ELSE CAST($MixDefaultShare AS DOUBLE) END")
      val b = Sampling.bucketOfSql("doc_id", "mix", 1000000)
      s"""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
         |t AS (SELECT count(*) AS total FROM documents),
         |s AS (SELECT d.doc_id, d.source AS source, c.n, t.total, $caseExpr AS share
         |      FROM documents d JOIN c ON c.source = d.source CROSS JOIN t)
         |SELECT doc_id, source FROM s
         |WHERE $b < least(1000000, CAST(floor(1e6 * $MixTotalFrac * total * share / n) AS BIGINT))
         |ORDER BY doc_id""".stripMargin
    },
    "q_zorder" ->
      """SELECT doc_id,
        |  CAST(list_sum(list_transform(generate_series(0, 7), i ->
        |    ((((doc_id % 256) >> i) & 1) << (2 * i)) +
        |    ((((n_chars % 256) >> i) & 1) << (2 * i + 1)))) AS BIGINT) AS z
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_repetition" ->
      s"""WITH $tokCte,
         |s AS (SELECT doc_id, toks, len(toks) AS n,
         |        list_sort(toks) AS srt FROM d WHERE len(toks) >= 3),
         |b AS (SELECT *, list_concat(list_filter(generate_series(1, n),
         |        i -> i = 1 OR srt[i] != srt[i - 1]), [n + 1]) AS bounds
         |      FROM s),
         |m AS (SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
         |  CAST(list_max(list_transform(generate_series(1, len(bounds) - 1),
         |    j -> bounds[j + 1] - bounds[j])) AS BIGINT) AS top_n,
         |  list_transform(generate_series(1, n - 1),
         |    i -> toks[i] || ' ' || toks[i + 1]) AS g2,
         |  list_transform(generate_series(1, n - 2),
         |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) AS g3,
         |  n FROM b)
         |SELECT doc_id, n_tokens, top_n,
         |  CAST(round(CAST(CAST((top_n / n_tokens) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) AS top_token_frac,
         |  CAST(round(CAST(CAST(((n - 1 - len(list_distinct(g2))) / CAST(n - 1 AS DOUBLE)) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) AS dup_2gram_frac,
         |  CAST(round(CAST(CAST(((n - 2 - len(list_distinct(g3))) / CAST(n - 2 AS DOUBLE)) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) AS dup_3gram_frac,
         |  (top_n * 5 > n_tokens) AS is_repetitive
         |FROM m ORDER BY doc_id""".stripMargin,
    "q_pii_scrub" -> {
      import graft.operators.TextAnalysis.{EmailRe, Ipv4Re, LongNumRe}
      s"""WITH p AS (SELECT doc_id, text
         |    || ' contact user' || CAST(doc_id % 50 AS VARCHAR)
         |    || '@mail' || CAST(doc_id % 7 AS VARCHAR)
         |    || '.example.com from 10.' || CAST(doc_id % 200 AS VARCHAR)
         |    || '.3.' || CAST(doc_id % 100 AS VARCHAR)
         |    || ' ref ' || CAST(7000000 + doc_id * 37 AS VARCHAR) AS text
         |  FROM documents),
         |r1 AS (SELECT doc_id, text,
         |    regexp_replace(text, '$EmailRe', '<EMAIL>', 'g') AS after_email FROM p),
         |r2 AS (SELECT *, regexp_replace(after_email, '$Ipv4Re', '<IP>', 'g') AS after_ip FROM r1),
         |r3 AS (SELECT *, regexp_replace(after_ip, '$LongNumRe', '<NUM>', 'g') AS redacted FROM r2)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(after_email, '$Ipv4Re')) AS BIGINT) AS n_ipv4,
         |  CAST(len(regexp_extract_all(after_ip, '$LongNumRe')) AS BIGINT) AS n_longnum,
         |  md5(redacted) AS redacted_hash
         |FROM r3 ORDER BY doc_id""".stripMargin
    },
    "q_linear_score" ->
      s"""WITH $tokCte,
         |w AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         |        CAST(list_sum(list_transform(toks,
         |            t -> (${Hashing.md5Long60Sql("t")} % 2001 - 1000))) AS BIGINT) AS wsum
         |      FROM d WHERE len(toks) >= 1),
         |e AS (SELECT doc_id, n_tokens,
         |        (CASE WHEN wsum < 0 THEN -1 ELSE 1 END)
         |          * ((2 * abs(wsum) * 1000 + n_tokens) // (2 * n_tokens)) AS e6
         |      FROM w)
         |SELECT doc_id, n_tokens, e6 / 1000000.0 AS score,
         |  e6 / 1000000.0 > 0.0 AS pass
         |FROM e ORDER BY doc_id""".stripMargin,
    "q_url_domains" -> {
      val blocked = BlockedDomains.map(d => s"'$d'").mkString(", ")
      // structural bounds derived from the SAME parsed rules the Spark
      // side consumes — a refreshed PSL snapshot with deeper rules (or
      // new exception depths) regenerates the arms instead of silently
      // diverging from hardcoded literals
      val maxL = Psl.default.maxRuleLabels
      // last-n-label extractions for hosts up to the deepest rule + 1
      val labCols = (1 to maxL + 1).map { n =>
        s"NULLIF(regexp_extract(host, '((?:[^.]+\\.){${n - 1}}[^.]+)$$', 1), '') AS l$n"
      }.mkString(",\n         |        ")
      // exception arms first (deepest first) — mirrors the Spark chain
      val excArms = Psl.default.exceptions.keys.toSeq.sorted.reverse.map { d =>
        s"""WHEN l$d IN (SELECT substr(rule, 2) FROM r
           |               WHERE rule LIKE '!%' AND nlab = $d) THEN l$d"""
          .stripMargin
      }.mkString("\n         |        ")
      // one arm per rule length, longest first: exact match at depth
      // `len`, or a wildcard whose (len-1)-label base matches AND the
      // host has a label over the base (a host EQUAL to the base falls
      // through — the wildcard does not match it)
      val lengthArms = (maxL to 2 by -1).map { len =>
        s"""WHEN l$len IN (SELECT rule FROM r
           |               WHERE rule NOT LIKE '!%' AND rule NOT LIKE '*.%' AND nlab = $len)
           |          OR (l$len IS NOT NULL
           |              AND l${len - 1} IN (SELECT substr(rule, 3) FROM r
           |               WHERE rule LIKE '*.%' AND nlab = $len)) THEN l${len + 1}"""
          .stripMargin
      }.mkString("\n         |        ")
      s"""WITH p AS (SELECT doc_id, text
         |    || ' see https://w' || CAST(doc_id % 7 AS VARCHAR)
         |    || '.site' || CAST(doc_id % 23 AS VARCHAR) || '.example/page'
         |    || ' and http://cdn' || CAST(doc_id % 5 AS VARCHAR)
         |    || '.assets' || CAST(doc_id % 11 AS VARCHAR) || '.net/x'
         |    || ' or https://shop' || CAST(doc_id % 13 AS VARCHAR) || '.co.uk/p'
         |    || ' plus https://alpha' || CAST(doc_id % 9 AS VARCHAR)
         |    || '.beta' || CAST(doc_id % 11 AS VARCHAR) || '.ck/z'
         |    || ' deep https://w' || CAST(doc_id % 3 AS VARCHAR)
         |    || '.v' || CAST(doc_id % 4 AS VARCHAR)
         |    || '.shop' || CAST(doc_id % 5 AS VARCHAR) || '.kawasaki.jp/x'
         |    || ' img https://img' || CAST(doc_id % 7 AS VARCHAR) || '.www.ck/i'
         |    || ' bare https://kawasaki.jp/q' AS text
         |  FROM documents),
         |h AS (SELECT doc_id,
         |        regexp_replace(
         |          unnest(regexp_extract_all(text, 'https?://([A-Za-z0-9.-]+)', 1)),
         |          '\\.+$$', '') AS host
         |      FROM p),
         |raw AS (SELECT trim(ln) AS rule FROM (
         |    SELECT unnest(string_split(content, chr(10))) AS ln
         |    FROM read_text('${Psl.datFile}'))
         |  WHERE trim(ln) <> '' AND trim(ln) NOT LIKE '//%'),
         |r AS (SELECT rule,
         |        length(rule) - length(replace(rule, '.', '')) + 1 AS nlab
         |      FROM raw),
         |l AS (SELECT doc_id, host,
         |        $labCols
         |      FROM h),
         |d AS (SELECT doc_id,
         |        CASE $excArms
         |        $lengthArms
         |        ELSE l2 END AS domain
         |      FROM l)
         |SELECT domain, count(*) AS n_urls,
         |  count(DISTINCT doc_id) AS n_docs,
         |  domain IN ($blocked) AS blocked
         |FROM d WHERE domain IS NOT NULL GROUP BY domain ORDER BY domain""".stripMargin
    },
    "q_fingerprint" ->
      s"""WITH $tokCte,
         |r AS (SELECT doc_id, unnest(list_transform(toks, (t, i) ->
         |        (((${h60("t")} % 1073741824) << ((i - 1) % 30)) |
         |         ((${h60("t")} % 1073741824) >> (30 - ((i - 1) % 30)))) & 1073741823)) AS v
         |      FROM d)
         |SELECT doc_id, count(*) AS n_tokens, bit_xor(v) AS fp
         |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // The multimodal oracles reproduce REAL ImageIO decode output from
    // the closed-form synthesis parameters (gray(y, f) = (a*y + c +
    // f*step) % 256, constant along x): the Spark side reads these
    // values out of actual decoded PNG/GIF rasters, the oracle from
    // the formula. Means divide exact integer sums: Spark's
    // sum(pixels)/(w*h) equals rowsum/h bit-for-bit because
    // sum(pixels) = w*rowsum exactly and IEEE division is correctly
    // rounded ((w*s)/(w*n) and s/n share the same real quotient).
    "q_mm_frames" ->
      s"""WITH p AS (SELECT doc_id,
         |    32 + (doc_id % 12) * 8 AS h,
         |    1 + (doc_id % 7) AS a,
         |    doc_id % 256 AS c,
         |    1 + (doc_id % 4) AS nf
         |  FROM documents),
         |f AS (SELECT doc_id, h, a, c,
         |        unnest(generate_series(0, nf - 1)) AS fi FROM p)
         |SELECT doc_id, CAST(fi AS INTEGER) AS frame_idx,
         |  array_to_string(list_transform(generate_series(0, 3),
         |    y -> printf('%02x', (a*y + c + fi*${Multimodal.FrameStep}) % 256)), '') AS frame_hex,
         |  CAST(list_sum(list_transform(generate_series(0, h - 1),
         |    y -> (a*y + c + fi*${Multimodal.FrameStep}) % 256)) AS DOUBLE) / h AS frame_mean
         |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    "q_mm_audio" ->
      s"""WITH p AS (SELECT doc_id,
         |    8000 + (doc_id % 3) * 4000 AS rate,
         |    800 + (doc_id % 8) * 200 AS n,
         |    1 + (doc_id % 7) AS a,
         |    doc_id % 256 AS c
         |  FROM documents),
         |s AS (SELECT doc_id, rate, n,
         |        list_transform(generate_series(0, n - 1),
         |          i -> ((a*i + c) % 4096) - 2048) AS smp
         |      FROM p)
         |SELECT doc_id,
         |  CAST(44 + 2 * n AS INTEGER) AS size_bytes,
         |  '52494646' AS magic,
         |  CAST(rate AS INTEGER) AS sample_rate,
         |  CAST(1 AS INTEGER) AS channels,
         |  CAST(16 AS INTEGER) AS bits,
         |  CAST(n AS BIGINT) AS n_samples,
         |  CAST(n AS DOUBLE) / rate AS duration_s,
         |  CAST(list_max(list_transform(smp, x -> abs(x))) AS INTEGER) AS peak,
         |  sqrt(CAST(list_sum(list_transform(smp, x -> x * x)) AS DOUBLE) / n) AS rms
         |FROM s ORDER BY doc_id""".stripMargin,
    "q_mm_resize" ->
      s"""WITH p AS (SELECT doc_id,
         |    64 + (doc_id % 16) * 4 AS w,
         |    32 + (doc_id % 12) * 8 AS h
         |  FROM documents),
         |s AS (SELECT doc_id, w, h,
         |    least(1.0, 64.0 / greatest(w, h)) AS sc FROM p)
         |SELECT doc_id,
         |  '89504e47' AS out_magic,
         |  CAST(greatest(1, floor(w * sc + 0.5)) AS INTEGER) AS out_width,
         |  CAST(greatest(1, floor(h * sc + 0.5)) AS INTEGER) AS out_height
         |FROM s ORDER BY doc_id""".stripMargin,
    // M5: every dhash bit and histogram bin recomputed from the ramp;
    // rowsum comparisons reduce to gray comparisons (rows constant
    // along x, same width both sides of each comparison).
    "q_mm_phash" -> {
      val histBins = (0 to 3).map(b =>
        s"""CAST(w * len(list_filter(generate_series(0, h - 1),
           |      y -> ((a*y + c) % 256) // 64 = $b)) AS BIGINT) AS h4_$b""".stripMargin)
        .mkString(",\n    ")
      s"""WITH p AS (SELECT doc_id,
         |    64 + (doc_id % 16) * 4 AS w,
         |    32 + (doc_id % 12) * 8 AS h,
         |    1 + (doc_id % 7) AS a,
         |    doc_id % 256 AS c
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(w AS INTEGER) AS width,
         |  CAST(h AS INTEGER) AS height,
         |  CAST(list_sum(list_transform(generate_series(0, 59),
         |    j -> CASE WHEN (a * (((j+1)*(h-1))//60) + c) % 256
         |                 > (a * ((j*(h-1))//60) + c) % 256
         |         THEN CAST(1 AS BIGINT) << j ELSE 0 END)) AS BIGINT) AS dhash,
         |    $histBins
         |FROM p ORDER BY doc_id""".stripMargin
    },
    // M5 -> D4: all-pairs brute force over the closed-form dHash —
    // legitimate ONLY in the oracle (the Spark side's banded join must
    // produce the identical set because nBands > maxHamming).
    "q_mm_neardup" ->
      """WITH p AS (SELECT doc_id,
        |    1 + (doc_id % 7) AS a, doc_id % 256 AS c,
        |    32 + (doc_id % 12) * 8 AS h
        |  FROM documents),
        |d AS (SELECT doc_id,
        |  CAST(list_sum(list_transform(generate_series(0, 59),
        |    j -> CASE WHEN (a * (((j+1)*(h-1))//60) + c) % 256
        |                 > (a * ((j*(h-1))//60) + c) % 256
        |         THEN CAST(1 AS BIGINT) << j ELSE 0 END)) AS BIGINT) AS dhash
        |  FROM p)
        |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
        |  CAST(bit_count(xor(x.dhash, y.dhash)) AS BIGINT) AS hamming
        |FROM d x JOIN d y ON x.doc_id < y.doc_id
        |WHERE bit_count(xor(x.dhash, y.dhash)) <= 2
        |ORDER BY doc_a, doc_b""".stripMargin,
    // M8 -> D4: all-pairs brute force over the closed-form acoustic
    // fingerprint (61 integer window energies of the sample ramp,
    // sign-of-delta bits) — legitimate ONLY in the oracle; the Spark
    // side decodes REAL PCM and its banded join must produce the
    // identical set because nBands > maxHamming.
    "q_mm_aneardup" ->
      """WITH p AS (SELECT doc_id, 1 + (doc_id % 7) AS a, doc_id % 256 AS c,
        |        800 + (doc_id % 8) * 200 AS n FROM documents),
        |s AS (SELECT doc_id, CAST((i * 61) // n AS INTEGER) AS j,
        |        (a * i + c) % 4096 - 2048 AS v
        |      FROM (SELECT doc_id, a, c, n,
        |              unnest(generate_series(0, n - 1)) AS i FROM p) x),
        |e AS (SELECT doc_id, j,
        |        CAST(sum(CAST(v AS BIGINT) * v) AS BIGINT) AS en
        |      FROM s GROUP BY 1, 2),
        |b AS (SELECT doc_id, j,
        |        CASE WHEN lead(en) OVER (PARTITION BY doc_id ORDER BY j) > en
        |          THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END AS bit
        |      FROM e),
        |f AS (SELECT doc_id, CAST(sum(bit) AS BIGINT) AS afp
        |      FROM b WHERE j < 60 GROUP BY 1)
        |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
        |  CAST(bit_count(xor(x.afp, y.afp)) AS BIGINT) AS hamming
        |FROM f x JOIN f y ON x.doc_id < y.doc_id
        |WHERE bit_count(xor(x.afp, y.afp)) <= 2
        |ORDER BY doc_a, doc_b""".stripMargin,
    // M9: the M8 closed-form pair set -> the D6 recursive-CTE
    // connected-components device, verbatim the q_dedup_clusters
    // reach pattern.
    "q_mm_aclusters" ->
      """WITH RECURSIVE p AS (SELECT doc_id, 1 + (doc_id % 7) AS a,
        |        doc_id % 256 AS c, 800 + (doc_id % 8) * 200 AS n
        |      FROM documents),
        |s AS (SELECT doc_id, CAST((i * 61) // n AS INTEGER) AS j,
        |        (a * i + c) % 4096 - 2048 AS v
        |      FROM (SELECT doc_id, a, c, n,
        |              unnest(generate_series(0, n - 1)) AS i FROM p) x),
        |e AS (SELECT doc_id, j,
        |        CAST(sum(CAST(v AS BIGINT) * v) AS BIGINT) AS en
        |      FROM s GROUP BY 1, 2),
        |b AS (SELECT doc_id, j,
        |        CASE WHEN lead(en) OVER (PARTITION BY doc_id ORDER BY j) > en
        |          THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END AS bit
        |      FROM e),
        |f AS (SELECT doc_id, CAST(sum(bit) AS BIGINT) AS afp
        |      FROM b WHERE j < 60 GROUP BY 1),
        |jp AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
        |       FROM f x JOIN f y ON x.doc_id < y.doc_id
        |       WHERE bit_count(xor(x.afp, y.afp)) <= 2),
        |edges AS (SELECT doc_a AS v, doc_b AS u FROM jp
        |          UNION ALL SELECT doc_b, doc_a FROM jp),
        |reach(v, m) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e2.v, r.m FROM edges e2 JOIN reach r ON r.v = e2.u)
        |SELECT v AS doc_id, min(m) AS cluster_id
        |FROM reach GROUP BY v ORDER BY doc_id""".stripMargin,
    // M10: the M9 label chain at the near-exact tier (Hamming <= 1)
    // + the D11 winner tail: longest clip (n) wins, ties to the
    // smallest doc_id.
    "q_mm_akeep" ->
      """WITH RECURSIVE p AS (SELECT doc_id, 1 + (doc_id % 7) AS a,
        |        doc_id % 256 AS c, 800 + (doc_id % 8) * 200 AS n
        |      FROM documents),
        |s AS (SELECT doc_id, CAST((i * 61) // n AS INTEGER) AS j,
        |        (a * i + c) % 4096 - 2048 AS v
        |      FROM (SELECT doc_id, a, c, n,
        |              unnest(generate_series(0, n - 1)) AS i FROM p) x),
        |e AS (SELECT doc_id, j,
        |        CAST(sum(CAST(v AS BIGINT) * v) AS BIGINT) AS en
        |      FROM s GROUP BY 1, 2),
        |b AS (SELECT doc_id, j,
        |        CASE WHEN lead(en) OVER (PARTITION BY doc_id ORDER BY j) > en
        |          THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END AS bit
        |      FROM e),
        |f AS (SELECT doc_id, CAST(sum(bit) AS BIGINT) AS afp
        |      FROM b WHERE j < 60 GROUP BY 1),
        |jp AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
        |       FROM f x JOIN f y ON x.doc_id < y.doc_id
        |       WHERE bit_count(xor(x.afp, y.afp)) <= 1),
        |edges AS (SELECT doc_a AS v, doc_b AS u FROM jp
        |          UNION ALL SELECT doc_b, doc_a FROM jp),
        |reach(v, m) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e2.v, r.m FROM edges e2 JOIN reach r ON r.v = e2.u),
        |lab AS (SELECT v AS doc_id, min(m) AS cluster_id
        |        FROM reach GROUP BY v),
        |mem AS (SELECT l.doc_id, l.cluster_id, pp.n AS q
        |        FROM lab l JOIN p pp USING (doc_id)),
        |r AS (SELECT doc_id, cluster_id, q,
        |        row_number() OVER (PARTITION BY cluster_id
        |                           ORDER BY q DESC, doc_id) AS rn,
        |        count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |      FROM mem),
        |k AS (SELECT cluster_id, doc_id AS keep_id FROM r WHERE rn = 1)
        |SELECT r.doc_id, r.cluster_id, r.cluster_size, k.keep_id,
        |  CAST(CASE WHEN r.doc_id = k.keep_id THEN 1 ELSE 0 END AS BIGINT)
        |    AS is_kept
        |FROM r JOIN k USING (cluster_id) ORDER BY r.doc_id""".stripMargin,
    // T20: first-occurrence doc per bigram type -> buckets -> cumsum.
    "q_vocab_growth" ->
      """WITH tk AS (SELECT doc_id,
        |        regexp_split_to_array(trim(text), '\s+') AS toks
        |      FROM documents),
        |t AS (SELECT doc_id,
        |        unnest(list_transform(generate_series(1, len(toks) - 1),
        |          i -> toks[i] || ' ' || toks[i+1])) AS tok
        |      FROM tk WHERE len(toks) >= 2),
        |f AS (SELECT tok, min(doc_id) AS first FROM t GROUP BY tok),
        |b AS (SELECT first // 25 AS bucket, count(*) AS new_types
        |      FROM f GROUP BY 1)
        |SELECT bucket, new_types,
        |  CAST(sum(new_types) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
        |    AS BIGINT) AS cum_types
        |FROM b ORDER BY bucket""".stripMargin,
    // M6: sign-flip count over the closed-form sample ramp.
    "q_mm_zcr" ->
      s"""WITH p AS (SELECT doc_id, 1 + (doc_id % 7) AS a, doc_id % 256 AS c,
         |        800 + (doc_id % 8) * 200 AS n FROM documents),
         |z AS (SELECT doc_id, n,
         |        CAST(len(list_filter(generate_series(1, n - 1), i ->
         |          ((a * i + c) % 4096 - 2048 >= 0)
         |            <> ((a * (i - 1) + c) % 4096 - 2048 >= 0)))
         |          AS BIGINT) AS zc
         |      FROM p)
         |SELECT doc_id, CAST(n AS BIGINT) AS n_samples, zc AS zero_crossings,
         |  CAST(round(CAST(CAST((CAST(zc AS DOUBLE) / (n - 1)) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS zcr
         |FROM z ORDER BY doc_id""".stripMargin,
    "q_mm_meta" ->
      s"""WITH p AS (SELECT doc_id,
         |    64 + (doc_id % 16) * 4 AS w,
         |    32 + (doc_id % 12) * 8 AS h,
         |    1 + (doc_id % 7) AS a,
         |    doc_id % 256 AS c
         |  FROM documents)
         |SELECT doc_id,
         |  CASE WHEN doc_id % 2 = 0 THEN '89504e47' ELSE '47494638' END AS magic,
         |  CAST(w AS INTEGER) AS width,
         |  CAST(h AS INTEGER) AS height,
         |  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 1 + (doc_id % 4) END
         |    AS INTEGER) AS n_frames,
         |  CAST(list_sum(list_transform(generate_series(0, h - 1),
         |    y -> (a*y + c) % 256)) AS DOUBLE) / h AS mean_px
         |FROM p ORDER BY doc_id""".stripMargin)

  /** The recall gate's oracle nests the S1/S2/S3 oracle chains
    * VERBATIM (DuckDB accepts a WITH chain inside a parenthesized
    * subquery), so the ground truth can never drift from the three
    * gated ANN queries it grades.
    */
  val oracleSql: Map[String, String] = oracleBase + ("q_ann_recall" ->
    s"""SELECT b.query_id, count(*) AS n_true,
       |  CAST(coalesce(sum(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 END), 0)
       |    AS BIGINT) AS n_lsh_hit,
       |  CAST(coalesce(sum(CASE WHEN m.neighbor_id IS NOT NULL THEN 1 END), 0)
       |    AS BIGINT) AS n_mp_hit,
       |  CAST(coalesce(sum(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 END), 0)
       |    AS BIGINT) AS n_mt_hit,
       |  CAST(coalesce(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 END), 0)
       |    AS BIGINT) AS n_ivf_hit,
       |  coalesce(sum(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 END), 0)
       |    / count(*) AS recall_lsh,
       |  coalesce(sum(CASE WHEN m.neighbor_id IS NOT NULL THEN 1 END), 0)
       |    / count(*) AS recall_mp,
       |  coalesce(sum(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 END), 0)
       |    / count(*) AS recall_mt,
       |  coalesce(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 END), 0)
       |    / count(*) AS recall_ivf
       |FROM (${oracleBase("q_ann_topk")}) b
       |LEFT JOIN (${oracleBase("q_ann_lsh")}) l
       |  ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
       |LEFT JOIN (${oracleBase("q_ann_lsh_mp")}) m
       |  ON b.query_id = m.query_id AND b.neighbor_id = m.neighbor_id
       |LEFT JOIN (${oracleBase("q_ann_lsh_mt")}) t
       |  ON b.query_id = t.query_id AND b.neighbor_id = t.neighbor_id
       |LEFT JOIN (${oracleBase("q_ann_ivf")}) i
       |  ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
       |GROUP BY b.query_id ORDER BY b.query_id""".stripMargin)
  // Sketch queries stay rows-only (engine-specific sketch semantics,
  // tolerance-asserted in the ScalaTest suite).
}
