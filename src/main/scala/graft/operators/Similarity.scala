package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, IpExpressions}

/** Embedding similarity operators (SURVEY.md §2.3 D5, S1, S2).
  *
  * Dot products are a sequential double fold over the vector — the same
  * evaluation order the oracle engine uses — so cosines are
  * bit-identical across engines and threshold filters cannot disagree.
  */
object Similarity {

  /** Sequential-fold dot product of two array<double> columns — the
    * native codegen expression (tight primitive loop; the zip_with +
    * aggregate composition allocated an intermediate product array per
    * row). Same fold order, so cosines stay bit-identical to the
    * oracle.
    */
  def dotD(a: Column, b: Column): Column = IpExpressions.dot(a, b)

  /** vectors + squared-norm column, embedding cast float->double once. */
  def withNorm(df: DataFrame, idCol: String, vecCol: String,
      extra: Seq[String] = Nil): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val cols = Seq(col(idCol).as("vec_id")) ++ extra.map(col) ++
      Seq(v.as("v"))
    df.select(cols: _*).withColumn("nrm2", dotD(col("v"), col("v")))
  }

  def cosine(dot: Column, na2: Column, nb2: Column): Column =
    dot / sqrt(na2 * nb2)

  /** D5: embedding near-dup — cosine >= tau pairs, blocked on a key
    * column so the join shuffles on the block key instead of going
    * all-pairs (at 100 TB the block key is a cluster/bucket id).
    */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
      blockCol: String, tau: Double): DataFrame = {
    val n = withNorm(df, idCol, vecCol, Seq(blockCol))
    val a = n.as("a")
    val b = n.as("b")
    val cos = cosine(dotD(col("a.v"), col("b.v")), col("a.nrm2"), col("b.nrm2"))
    a.join(b, col(s"a.$blockCol") === col(s"b.$blockCol") &&
        col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", cos)
      .filter(col("cos") >= tau)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        col(s"a.$blockCol").as(blockCol), round(col("cos"), 6).as("cos"))
  }

  /** D5 at scale, label-free: block pairs by sign-random-projection
    * bucket instead of a label column — candidates shuffle on the
    * computed bucket, so the operator needs no prior clustering.
    * Near-identical vectors share every sign bit, so exact duplicates
    * are always co-bucketed; recall for milder near-dups is tuned by
    * the plane count (fewer planes = bigger buckets = higher recall).
    */
  def cosinePairsLsh(df: DataFrame, idCol: String, vecCol: String,
      tau: Double, nPlanes: Int, dim: Int): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val n = withNorm(df, idCol, vecCol)
      .withColumn("bucket", lshBucket(col("v"), planes))
    val a = n.as("a")
    val b = n.as("b")
    val cos = cosine(dotD(col("a.v"), col("b.v")), col("a.nrm2"), col("b.nrm2"))
    a.join(b, col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", cos)
      .filter(col("cos") >= tau)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        col("a.bucket").as("bucket"), round(col("cos"), 6).as("cos"))
  }

  /** S1: brute-force cosine top-k — the exact baseline. The (small)
    * query set is broadcast; ranking is a per-query window.
    */
  def bruteTopK(vecs: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val n = withNorm(vecs, idCol, vecCol)
    val q = withNorm(queries, idCol, vecCol)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm2").as("qn"))
    val cos = cosine(dotD(col("qv"), col("v")), col("qn"), col("nrm2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    broadcast(q).join(n, col("query_id") =!= col("vec_id"))
      .withColumn("cos", cos)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"),
        col("vec_id").as("neighbor_id"), round(col("cos"), 6).as("cos"))
  }

  // ------------------------------------------------- LSH-bucketed ANN

  /** Deterministic random hyperplanes for sign-random-projection LSH:
    * component (plane j, dim d) = (md5_60("{salt}j_d") mod 2001 - 1000)
    * / 1000, computed driver-side (tiny) with the same md5 the data
    * side uses. `salt` decorrelates independent tables
    * ([[lshTopKMultiTable]]); the default empty salt keeps the
    * single-table operators' historical planes.
    */
  def hyperplanes(nPlanes: Int, dim: Int, salt: String = ""): Array[Array[Double]] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nPlanes, dim) { (j, d) =>
      val hex = digest.digest(s"$salt${j}_$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      ((h % 2001L) - 1000L).toDouble / 1000.0
    }
  }

  /** Bucket id = sign bits of the vector against each hyperplane. */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val lp = array(p.toIndexedSeq.map(lit): _*)
      when(dotD(v, lp) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Multi-probe bucket list for a query vector: its own bucket plus
    * every sign combination of the `nFlip` lowest-|margin| planes —
    * the planes the vector sits closest to, i.e. the bits most likely
    * to differ from a true neighbor's. 2^nFlip DISTINCT buckets (the
    * flip masks are distinct subsets of distinct plane bits), all
    * derived deterministically from the dot products, so an external
    * engine reproduces the exact probe set: margins use the same
    * sequential-fold dot as everything else, and the flip order ties
    * break on the plane index.
    */
  def lshProbeBuckets(v: Column, planes: Array[Array[Double]],
      nFlip: Int): Column = {
    require(nFlip >= 0 && nFlip <= planes.length,
      s"nFlip=$nFlip out of range for ${planes.length} planes")
    val ds = array(planes.zipWithIndex.map { case (p, j) =>
      val d = dotD(v, array(p.toIndexedSeq.map(lit): _*))
      struct(abs(d).as("m"), lit(j).as("j"),
        when(d > 0, lit(1L << j)).otherwise(lit(0L)).as("bit"),
        lit(1L << j).as("flip"))
    }: _*)
    val base = aggregate(ds, lit(0L), (acc, s) => acc + s.getField("bit"))
    // ascending (margin, plane index): the nFlip least-confident bits
    val flips = slice(array_sort(ds), 1, nFlip)
    array((0 until (1 << nFlip)).map { mask =>
      // static subset enumeration: XOR of disjoint plane bits == flip
      (0 until nFlip).filter(i => (mask & (1 << i)) != 0)
        .map(i => element_at(flips, i + 1).getField("flip"))
        .foldLeft(base)((acc, f) => acc.bitwiseXOR(f))
    }: _*)
  }

  /** S5: multi-probe LSH ANN — the recall fix for single-probe SRP
    * ([[lshTopK]]): with B buckets over N vectors a single probe sees
    * ~N/B candidates, and the recall gate measured that at ~0-0.4
    * recall@5. Probing the 2^nFlip perturbations of the least-confident
    * sign bits multiplies candidates by 2^nFlip while the join stays
    * bucket-keyed — the standard multi-probe LSH trade (probes, not
    * tables). Each data vector still lives in ONE bucket; the probe
    * buckets are distinct, so candidates never duplicate and no
    * dedup pass is needed.
    */
  def lshTopKMultiProbe(vecs: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nPlanes: Int, dim: Int, nFlip: Int): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val n = withNorm(vecs, idCol, vecCol)
      .withColumn("bucket", lshBucket(col("v"), planes))
    val q = withNorm(queries, idCol, vecCol)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm2").as("qn"))
      .withColumn("bucket",
        explode(lshProbeBuckets(col("qv"), planes, nFlip)))
    val cos = cosine(dotD(col("qv"), col("v")), col("qn"), col("nrm2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    broadcast(q).join(n, Seq("bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos", cos)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"),
        col("vec_id").as("neighbor_id"), round(col("cos"), 6).as("cos"))
  }

  /** S7: multi-TABLE LSH ANN — the other classic recall lever
    * ([[lshTopKMultiProbe]] trades probes; this trades index size).
    * `nTables` independent plane sets (salted generators, so the
    * tables decorrelate) each bucket every vector once; a query probes
    * its own bucket in EVERY table and the candidate set is the union.
    * A true neighbor is missed only if it disagrees with the query in
    * at least one sign bit of every table — failure probability decays
    * geometrically in `nTables` at fixed plane count.
    *
    * Scale shape: the index is `nTables` posting rows per vector
    * (explode over the per-table buckets), the probe join shuffles on
    * the composite (table, bucket) key exactly like single-table LSH,
    * and cross-table duplicate candidates collapse in a
    * partial-aggregated groupBy on (query, neighbor) BEFORE ranking —
    * the arrays are dropped at the join, so the dedup shuffles narrow
    * (id, id, cos) rows, never vectors.
    */
  def lshTopKMultiTable(vecs: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nPlanes: Int, dim: Int, nTables: Int): DataFrame = {
    require(nTables >= 1, s"nTables=$nTables must be >= 1")
    val tables = (0 until nTables)
      .map(tb => hyperplanes(nPlanes, dim, s"t${tb}_"))
    def withBuckets(df: DataFrame): DataFrame = df.withColumn("tb",
        explode(array(tables.zipWithIndex.map { case (pl, tb) =>
          struct(lit(tb).as("t"), lshBucket(col("v"), pl).as("bucket"))
        }: _*)))
      .select(df.columns.map(col) :+ col("tb.t").as("t") :+
        col("tb.bucket").as("bucket"): _*)
    val n = withBuckets(withNorm(vecs, idCol, vecCol))
    val q = withBuckets(withNorm(queries, idCol, vecCol))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm2").as("qn"), col("t"), col("bucket"))
    val cos = cosine(dotD(col("qv"), col("v")), col("qn"), col("nrm2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(q).join(n, Seq("t", "bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cos.as("__cos"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(max(col("__cos")).as("cos"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"))
  }

  /** The S2 + S5 recall arms in ONE pipeline (r17 opt, the S4 gate's
    * hot path): the single-probe LSH candidate set is exactly the
    * multi-probe set's probe-0 slice (probe 0 is the unflipped base
    * bucket, and probe buckets are distinct so candidates never
    * duplicate), so both arms share one bucketed corpus, one
    * candidate join, and one sorted window pass. `__m` flags the
    * multi-probe top-k (row_number over all candidates); `__l` flags
    * the single-probe top-k (running count over the probe-0 rows in
    * the same sort — the rank within that slice). Each slice is
    * row-identical to `lshTopK` / `lshTopKMultiProbe` at the same
    * parameters.
    */
  def lshRecallArms(vecs: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nPlanes: Int, dim: Int,
      nFlip: Int): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val n = withNorm(vecs, idCol, vecCol)
      .withColumn("bucket", lshBucket(col("v"), planes))
    val q = withNorm(queries, idCol, vecCol)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm2").as("qn"))
      .select(col("query_id"), col("qv"), col("qn"),
        posexplode(lshProbeBuckets(col("qv"), planes, nFlip))
          .as(Seq("__probe", "bucket")))
    val cos = cosine(dotD(col("qv"), col("v")), col("qn"), col("nrm2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    broadcast(q).join(n, Seq("bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos", cos)
      .withColumn("__mprnk", row_number().over(w).cast("long"))
      .withColumn("__lshrnk",
        sum(when(col("__probe") === 0, 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        when(col("__probe") === 0 && col("__lshrnk") <= k, 1L).as("__l"),
        when(col("__mprnk") <= k, 1L).as("__m"))
      .filter(col("__l").isNotNull || col("__m").isNotNull)
  }

  /** ALL FOUR S4 recall arms — brute truth, single-probe LSH (S2),
    * multi-probe LSH (S5), multi-table LSH (S7), IVF (S3) — in ONE
    * pipeline (r18 opt, completing the r17 [[lshRecallArms]] fusion).
    *
    * The key identity: the brute arm already enumerates EVERY
    * (query, candidate) pair with its cosine, and each approximate
    * arm's candidate set is a row-local PREDICATE over that pair —
    *   - single-probe LSH: corpus bucket == the query's base bucket
    *     (probe 0 of [[lshProbeBuckets]] is the unflipped bucket);
    *   - multi-probe: corpus bucket ∈ the query's probe array;
    *   - multi-table: any salted table t with bucket_t(corpus) ==
    *     bucket_t(query) (the OR dedups what the per-arm union +
    *     groupBy deduped);
    *   - IVF: the corpus vector's cell ∈ the query's nprobe nearest
    *     cells ([[IvfIndex.probeCells]]).
    * So ONE broadcast cross join + ONE window pass replace the four
    * candidate-join towers + the three left joins of the per-arm
    * gate: `rnk` (row_number over cos desc, vec_id) is the brute
    * rank, and each arm's rank is the running count of its flagged
    * rows in the SAME sort — identical to the rank the arm's own
    * window would assign, because a subset inherits the total order.
    * Every cosine is the same sequential-fold expression over the
    * same (v, nrm2) pair, so all slices stay bit-identical to the
    * per-arm operators (pinned in SimilaritySpec).
    *
    * The corpus side rides `ivf.cells` — IvfIndex.assign's output IS
    * withNorm + cell, so no second corpus pass and no join-back to
    * attach the cell. Returns one row per (query_id, neighbor_id)
    * in the brute top-k, with per-arm hit flags `__l/__m/__t/__i`
    * (1L when the pair is in that arm's top-k, else null) — the
    * shape the recall aggregation consumes.
    */
  def annRecallCandidates(queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nPlanes: Int, dim: Int, nFlip: Int,
      mtPlanes: Int, mtTables: Int, ivf: IvfIndex.Index,
      nprobe: Int): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val mtSets = (0 until mtTables)
      .map(tb => hyperplanes(mtPlanes, dim, s"t${tb}_"))
    val np = math.min(nprobe, ivf.centroids.length)
    val n = ivf.cells
      .withColumn("bucket", lshBucket(col("v"), planes))
      .withColumn("__mtb", array(mtSets.map(pl =>
        lshBucket(col("v"), pl)): _*))
    val q = withNorm(queries, idCol, vecCol)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm2").as("qn"))
      .withColumn("__probes", lshProbeBuckets(col("qv"), planes, nFlip))
      .withColumn("__qmtb", array(mtSets.map(pl =>
        lshBucket(col("qv"), pl)): _*))
      .withColumn("__qcells",
        IvfIndex.probeCells(col("qv"), col("qn"), ivf.centroids, np))
    val cos = cosine(dotD(col("qv"), col("v")), col("qn"), col("nrm2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def rank(flag: Column): Column =
      sum(when(flag, 1L).otherwise(0L)).over(run)
    val isL = element_at(col("__probes"), 1) === col("bucket")
    val isM = array_contains(col("__probes"), col("bucket"))
    val isT = (0 until mtTables).map(i =>
        element_at(col("__qmtb"), i + 1) === element_at(col("__mtb"), i + 1))
      .reduce(_ || _)
    val isI = array_contains(col("__qcells"), col("cell"))
    broadcast(q).join(n, col("query_id") =!= col("vec_id"))
      .withColumn("cos", cos)
      .withColumn("__rnk", row_number().over(w).cast("long"))
      .withColumn("__lr", rank(isL)).withColumn("__mr", rank(isM))
      .withColumn("__tr", rank(isT)).withColumn("__ir", rank(isI))
      .filter(col("__rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        when(isL && col("__lr") <= k, 1L).as("__l"),
        when(isM && col("__mr") <= k, 1L).as("__m"),
        when(isT && col("__tr") <= k, 1L).as("__t"),
        when(isI && col("__ir") <= k, 1L).as("__i"))
  }

  /** S2: LSH-bucketed ANN — queries probe only their own bucket, so the
    * search join shuffles on bucket id (at scale: per-bucket local
    * top-k instead of a full cross product). Approximate by design;
    * recall vs [[bruteTopK]] is asserted in the test suite — and
    * MEASURED by the gated recall query, which is what motivated
    * [[lshTopKMultiProbe]].
    */
  def lshTopK(vecs: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nPlanes: Int, dim: Int): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val n = withNorm(vecs, idCol, vecCol)
      .withColumn("bucket", lshBucket(col("v"), planes))
    val q = withNorm(queries, idCol, vecCol)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm2").as("qn"))
      .withColumn("bucket", lshBucket(col("qv"), planes))
    val cos = cosine(dotD(col("qv"), col("v")), col("qn"), col("nrm2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    broadcast(q).join(n, Seq("bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos", cos)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("bucket"), col("rnk"),
        col("vec_id").as("neighbor_id"), round(col("cos"), 6).as("cos"))
  }
}
