package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** E3: top principal component of an embedding column by power
  * iteration — the missing axis behind E2's cartography: E2 says how
  * tightly a group hugs its centroid, PCA says WHICH direction the
  * corpus actually varies along (embedding whitening, anisotropy
  * diagnostics — a healthy embedding space spreads variance, a
  * collapsed one concentrates it in one component — and the
  * projection axis IVF/PQ codebooks implicitly learn).
  *
  * Scale shape — the only part that touches the full corpus is ONE
  * aggregation: second-moment sums S[i,j] = Σ x_i·x_j and first
  * moments Σ x_i via a d² in-plan expansion that partial-aggregates
  * map-side down to d² rows before the single shuffle (the E2
  * explode-by-dim device, squared). The d×d matrix is driver-sized BY
  * CONSTRUCTION (d ≤ ~512 → ≤ 2 MB); power iteration then runs on the
  * driver — a sequential 30-step d² loop, microseconds, pointless to
  * distribute. Projections are one more row-local pass. The d²
  * per-row expansion is CPU fanout, not shuffle volume; past d ≈ 512
  * the right move is a matrix-accumulating TypedImperativeAggregate
  * (the A53 pattern), stated here rather than silently assumed.
  *
  * Determinism: moment sums accumulate as decimal(28,10) (exact,
  * order-independent — the E2 discipline), so the covariance matrix,
  * the driver iteration, and every projection are bit-identical under
  * any partitioning (spec-asserted by re-running repartitioned).
  */
object Pca {

  /** The distributed part: exact second/first moments per (i, j) with
    * j >= i — the moment matrix is symmetric, so only the upper
    * triangle flows through the expansion and the aggregation
    * (d(d+1)/2 instead of d² — measured ~2x off the whole pass at
    * sf0.1); decimal-exact sums then round-6 double
    * (order-independent, DuckDB-gated as `q_pca_moments`). Σx_i rides
    * on the diagonal rows.
    */
  def moments(df: DataFrame, vecCol: String): DataFrame =
    df.select(col(vecCol).cast("array<double>").as("v"))
      .select(posexplode(col("v")).as(Seq("i", "xi")), col("v"))
      .select(col("i"), col("xi"),
        posexplode(expr("slice(v, i + 1, size(v) - i)")).as(Seq("j0", "xj")))
      .select(col("i"), col("xi"), (col("j0") + col("i")).as("j"), col("xj"))
      .groupBy(col("i"), col("j"))
      .agg(
        round(sum((col("xi") * col("xj")).cast("decimal(28,10)")), 6)
          .cast("double").as("sxy"),
        round(sum(col("xi").cast("decimal(28,10)")), 6)
          .cast("double").as("sx"),
        count(lit(1)).as("n"))

  /** (mean, principal component, eigenvalue): the model, computed by
    * `iters` power-iteration steps from the deterministic uniform
    * start 1/√d. The component's sign is fixed by "largest-|coord|
    * entry is positive" (power iteration's sign is otherwise
    * arbitrary).
    */
  def topComponent(df: DataFrame, vecCol: String, iters: Int = 30)
      : (Vector[Double], Vector[Double], Double) = {
    require(iters >= 1, s"iters=$iters (want >= 1)")
    val momentRows = moments(df, vecCol).collect()
    require(momentRows.nonEmpty, "topComponent: empty input")
    // ragged corpora would leave high-(i,j) cells summed over FEWER
    // vectors — a silently wrong covariance; every cell must have seen
    // every vector
    require(momentRows.map(_.getLong(4)).distinct.length == 1,
      "topComponent: vectors have differing lengths — the moment " +
        "matrix is only defined over a uniform-dimension corpus")
    val d = momentRows.map(_.getInt(0)).max + 1
    val n = momentRows.head.getLong(4).toDouble
    val sxy = Array.ofDim[Double](d, d)
    val sx = new Array[Double](d)
    momentRows.foreach { r: Row =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      sxy(i)(j) = r.getDouble(2)
      sxy(j)(i) = r.getDouble(2) // symmetry: mirror the upper triangle
      if (i == j) sx(i) = r.getDouble(3) // Σx_i rides the diagonal
    }
    val mean = sx.map(_ / n)
    // covariance C[i][j] = Sxy/n − μi·μj
    val c = Array.tabulate(d, d)((i, j) => sxy(i)(j) / n - mean(i) * mean(j))
    iterate(c, mean, d, iters)
  }

  /** [[moments]]' output shape from the matrix AGGREGATE — the same
    * (i, j, sxy, sx, n) rows (bit-equal by the shared decimal
    * semantics), produced by one tight-loop pass instead of the d²
    * explosion: the aggregate's flat upper-triangle array joins a
    * driver-built broadcast (t → i, j) index. This is what the gate
    * runs (measured 8.1 → 2.1 s at sf0.1); [[moments]] stays as the
    * independently-derived twin the parity spec pins it against.
    */
  /** The matrix aggregate's map side is CPU-heavy — d(d+1)/2 exact
    * decimal conversions per row (each a shortest-decimal
    * BigDecimal.valueOf, the exactness contract's price) — so its
    * wall-clock is bounded by the SLOWEST partition, not the shuffle.
    * A small corpus arrives as ONE parquet split (sf0.1's 2,000 x
    * d=64 rows = 4.3M conversions serialized on one core while 31
    * idle — the whole 2.1 s isolated floor of q_pca_moments, r14
    * probe). When the scan yields fewer splits than cores,
    * round-robin repartition to defaultParallelism first: in that
    * regime the corpus is by definition tiny, so the extra exchange
    * ships almost nothing; at 100 TB splits >> cores and this branch
    * adds NO exchange. Values are unaffected either way — the
    * accumulator is integer adds, order-independent by construction
    * (PcaSpec pins repartition-invariance).
    */
  private def parallelizeInput(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }

  def momentsViaAgg(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val idx = (for (i <- 0 until dim; j <- i until dim)
      yield (i * (2 * dim - i + 1) / 2 + (j - i), i, j))
      .toDF("t", "i", "j")
    parallelizeInput(df).select(graft.functions.Moments.matrix(
        col(vecCol).cast("array<double>"), dim).as("m"))
      .select(col("m.n").as("n"), col("m.sx").as("sxv"),
        posexplode(col("m.sxy")).as(Seq("t", "sxy")))
      .join(broadcast(idx), "t")
      .select(col("i"), col("j"), col("sxy"),
        expr("element_at(sxv, i + 1)").as("sx"), col("n"))
  }

  /** E3b: [[momentsViaAgg]] PER GROUP — one moment matrix per group
    * key in the same single pass (the aggregate is a normal Spark
    * aggregate, so grouping composes for free). Per-cluster/source
    * anisotropy is the shape diagnostic E2's scalar compactness
    * cannot see: two groups with equal centroid-cosine spread can be
    * a sphere and a pancake; their per-group top eigenvalues differ.
    * Output bounded by groups × d(d+1)/2.
    */
  def momentsViaAggBy(df: DataFrame, vecCol: String, dim: Int,
      groupCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val idx = (for (i <- 0 until dim; j <- i until dim)
      yield (i * (2 * dim - i + 1) / 2 + (j - i), i, j))
      .toDF("t", "i", "j")
    parallelizeInput(df).groupBy(col(groupCol))
      .agg(graft.functions.Moments.matrix(
        col(vecCol).cast("array<double>"), dim).as("m"))
      .select(col(groupCol), col("m.n").as("n"), col("m.sx").as("sxv"),
        posexplode(col("m.sxy")).as(Seq("t", "sxy")))
      .join(broadcast(idx), "t")
      .select(col(groupCol), col("i"), col("j"), col("sxy"),
        expr("element_at(sxv, i + 1)").as("sx"), col("n"))
  }

  /** [[topComponent]] on the matrix-accumulating aggregate
    * ([[graft.functions.Moments]], the A53 pattern) — the scale path
    * the explode plan's scaladoc names: no d² row explosion, one
    * tight-loop accumulator per partition, bit-compatible decimal
    * semantics (PcaSpec pins the two paths equal to the last bit on
    * the corpus, and the r10 probe measured the explode plan's 8.0 s
    * sf0.1 pass at 0.6 s through the aggregate).
    */
  def topComponentFast(df: DataFrame, vecCol: String, dim: Int,
      iters: Int = 30): (Vector[Double], Vector[Double], Double) = {
    require(iters >= 1, s"iters=$iters (want >= 1)")
    val r = parallelizeInput(df).select(graft.functions.Moments.matrix(
      col(vecCol).cast("array<double>"), dim).as("m"))
      .select(col("m.n"), col("m.sx"), col("m.sxy")).head()
    val n = r.getLong(0).toDouble
    require(n > 0, "topComponentFast: empty input")
    val sx = r.getSeq[Double](1).toArray
    val tri = r.getSeq[Double](2).toArray
    val sxy = Array.ofDim[Double](dim, dim)
    var t = 0
    for (i <- 0 until dim; j <- i until dim) {
      sxy(i)(j) = tri(t); sxy(j)(i) = tri(t); t += 1
    }
    val mean = sx.map(_ / n)
    val c = Array.tabulate(dim, dim)((i, j) =>
      sxy(i)(j) / n - mean(i) * mean(j))
    iterate(c, mean, dim, iters)
  }

  private def iterate(c: Array[Array[Double]], mean: Array[Double],
      d: Int, iters: Int): (Vector[Double], Vector[Double], Double) = {
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var lambda = 0.0
    for (_ <- 1 to iters) {
      val w = Array.tabulate(d)(i =>
        (0 until d).map(j => c(i)(j) * v(j)).sum)
      val norm = math.sqrt(w.map(x => x * x).sum)
      require(norm > 0, "power iteration: zero-variance input")
      v = w.map(_ / norm)
      lambda = norm
    }
    val k = v.indices.maxBy(i => (math.abs(v(i)), -i))
    val s = if (v(k) < 0) -1.0 else 1.0
    (mean.toVector, v.map(_ * s).toVector, lambda)
  }

  /** Row-local projection of each vector onto the component (centered:
    * score = (x − μ)·pc). One map over the corpus; μ·pc folds to a
    * literal on the driver.
    */
  def project(df: DataFrame, idCol: String, vecCol: String,
      mean: Seq[Double], pc: Seq[Double]): DataFrame = {
    val muDotPc = mean.zip(pc).map { case (m, p) => m * p }.sum
    val pcLit = array(pc.map(lit): _*)
    df.select(col(idCol),
      round(Similarity.dotD(col(vecCol).cast("array<double>"), pcLit)
        - lit(muDotPc), 6).as("pc1_score"))
  }
}
