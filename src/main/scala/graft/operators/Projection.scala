package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** E5: Johnson–Lindenstrauss random projection (SURVEY.md §2.3) — the
  * dimensionality-reduction pass an embedding pipeline runs before
  * expensive pairwise work (ANN candidate generation, dedup blocking,
  * drift checks) when the native dimension is wasteful: project every
  * vector onto `k` fixed random directions; JL guarantees pairwise
  * geometry survives within (1 ± eps) for k = O(log n / eps^2).
  *
  * The planes come from the same deterministic md5-derived generator
  * as the LSH family (distinct salt), so an external engine can
  * re-derive the projection bit-for-bit — the [[Similarity]] oracle
  * discipline. Projection is a pure row-local map (k codegen dot
  * products per row, no shuffle, no state); at 100 TB it pipelines
  * inside whatever scan already reads the vectors.
  */
object Projection {

  /** Plane-generator salt — public so the oracle SQL builder derives
    * the identical literals.
    */
  val Salt = "jl"

  /** (vec_id, proj: array<double>[k]) with the standard 1/sqrt(k)
    * scaling, so expected squared norm matches the input's.
    */
  def jlProject(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int): DataFrame = {
    require(k > 0 && dim > 0, s"k=$k dim=$dim must be positive")
    val planes = Similarity.hyperplanes(k, dim, Salt)
    val scale = 1.0 / math.sqrt(k.toDouble)
    val proj = array(planes.toIndexedSeq.map { p =>
      Similarity.dotD(col("v"),
        array(p.toIndexedSeq.map(lit): _*)) * lit(scale)
    }: _*)
    Similarity.withNorm(vecs, idCol, vecCol)
      .select(col("vec_id"), proj.as("proj"))
  }

  /** E6: matryoshka-truncation distortion audit — the modern MRL
    * question ("can I serve the first k dims of these embeddings?")
    * answered the E5 way, but as the PER-K SUMMARY a capacity
    * decision reads, not a per-pair dump: for each prefix length k,
    * the absolute gap between full-dim cosine and prefix-k cosine
    * over the linear consecutive-id pair set, reported as
    * (n_pairs, sum/max/avg of the round-6 micro-integer error).
    * Per-pair errors ride the integer micro ladder (round-6 x 1e6 —
    * the T13 device), so the sums are ORDER-FREE exact longs under
    * any partitioning and only the final avg divides. Row-local
    * slices + dots (no shuffle before the k-keyed agg, |ks| rows
    * out). A zero prefix vector RAISES (ANSI divide-by-zero — the
    * loud-failure discipline): pick ks against embeddings with mass
    * in every prefix, as any MRL-trained model has.
    */
  def mrlDistortion(vecs: DataFrame, idCol: String, vecCol: String,
      ks: Seq[Int]): DataFrame = {
    // k > dim silently degenerates to the full vector on both engines
    // (slice caps at length) — err 0, same as k = dim; harmless but
    // pick ks <= dim for a meaningful curve
    require(ks.nonEmpty && ks.forall(_ > 0),
      s"ks=$ks must be non-empty and positive")
    val n = Similarity.withNorm(vecs, idCol, vecCol)
    val cf = Similarity.cosine(
      Similarity.dotD(col("a.v"), col("b.v")), col("a.nrm2"), col("b.nrm2"))
    val pairs = n.as("a")
      .join(n.as("b"), col("b.vec_id") === col("a.vec_id") + 1)
      .select(col("a.v").as("va"), col("b.v").as("vb"), cf.as("cf"))
    val perK = explode(array(ks.map { k =>
      val pa = slice(col("va"), 1, k)
      val pb = slice(col("vb"), 1, k)
      val ck = Similarity.cosine(Similarity.dotD(pa, pb),
        Similarity.dotD(pa, pa), Similarity.dotD(pb, pb))
      struct(lit(k.toLong).as("k"),
        round(round(abs(col("cf") - ck), 6) * 1e6).cast("long")
          .as("err_micro"))
    }.toIndexedSeq: _*))
    pairs.select(perK.as("e"))
      .select(col("e.k").as("k"), col("e.err_micro").as("err_micro"))
      .groupBy("k")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("err_micro")).as("sum_err_micro"),
        max(col("err_micro")).as("max_err_micro"))
      .withColumn("avg_err_micro",
        round(col("sum_err_micro") / col("n_pairs"), 4))
      .orderBy("k")
  }

  /** Distortion audit over consecutive-id pairs: per pair, the cosine
    * in the original space vs the projected space and their absolute
    * gap — the measured evidence for choosing `k` (the 1/sqrt(k)
    * scale cancels inside cosine, so the audit reads the raw dot
    * ladder). Consecutive ids make the pair set deterministic and
    * linear in the corpus — an audit, not an all-pairs sweep.
    */
  def jlDistortion(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int): DataFrame = {
    require(k > 0 && dim > 0, s"k=$k dim=$dim must be positive")
    val planes = Similarity.hyperplanes(k, dim, Salt)
    val proj = array(planes.toIndexedSeq.map(p =>
      Similarity.dotD(col("v"), array(p.toIndexedSeq.map(lit): _*))): _*)
    val n = Similarity.withNorm(vecs, idCol, vecCol)
      .withColumn("proj", proj)
      .withColumn("pn2", Similarity.dotD(col("proj"), col("proj")))
    val cosOrig = Similarity.cosine(
      Similarity.dotD(col("a.v"), col("b.v")), col("a.nrm2"), col("b.nrm2"))
    val cosProj = Similarity.cosine(
      Similarity.dotD(col("a.proj"), col("b.proj")), col("a.pn2"), col("b.pn2"))
    n.as("a")
      .join(n.as("b"), col("b.vec_id") === col("a.vec_id") + 1)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(cosOrig, 6).as("cos_orig"), round(cosProj, 6).as("cos_proj"),
        round(abs(cosOrig - cosProj), 6).as("abs_err"))
      .orderBy("id_a")
  }
}
