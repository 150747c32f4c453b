package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** E4: fixed-point Lloyd k-means (SURVEY.md §2.3) — clustering as a
  * first-class GATED operator, not just the bootstrap inside IVF/PQ.
  * A training-data pipeline clusters embeddings constantly (SemDeDup
  * cells, domain discovery, stratified curation quotas); `ml.KMeans`
  * fits distributed but averages floats in partition order, so two
  * runs legitimately differ in last ulps and no external engine can
  * reproduce the model bit-for-bit. This variant makes the WHOLE fit
  * deterministic: quantize coordinates to an integer ladder
  * (`floor((x + offset) · 1e6)`, offset makes every coordinate
  * non-negative so truncating and flooring division agree
  * cross-engine — negative inputs RAISE, the A62 discipline), then
  * every Lloyd step is exact integer arithmetic — squared-L2 from
  * integer-valued doubles, centroid update `sum div count` on longs —
  * identical on any engine, any partitioning, any core count.
  *
  * Exactness envelope: the quantized coordinates are CARRIED AS
  * DOUBLES holding exact integer values so the distance runs through
  * the codegen'd dot expression (|m−c|² = ⟨m,m⟩ − 2⟨m,c⟩ + ⟨c,c⟩ —
  * measured ~20× the interpreted zip_with/aggregate lambda form);
  * float64 arithmetic on integers is EXACT while every intermediate
  * stays under 2^53, i.e. d · max_micro² < 9·10¹⁵ — embedding-scale
  * inputs (|x| ≤ ~10 → micro ≤ ~10⁷) hold to d ≈ 100; wider/larger
  * ladders must shrink the scale (the bound is documented, the
  * offset-negativity violation RAISES).
  *
  * Scale shape per iteration: assignment is a ZERO-shuffle row-local
  * argmin against the k×d centroid literal array (the IvfIndex.assign
  * device — centroids are config-sized and ride into the expression),
  * and the update is ONE map-side-combinable grouped sum over the
  * posexploded (cell, dim) pairs followed by a k×d-sized collect
  * (driver-sized by construction — the legitimate iterative-fit
  * collect class shared with BPE's argmax and IVF's sampled
  * centroids). The quantized vector table materializes once; plan
  * depth stays constant across iterations because each round's
  * centroids are literals, not lineage.
  *
  * Empty cells keep their previous centroid (reported with n = 0) —
  * the standard Lloyd convention, and the one a SQL LEFT JOIN
  * reproduces exactly.
  */
object KMeansFixed {

  final case class Model(centroids: Array[Array[Long]], assigned: DataFrame)

  /** Quantized micro coordinates as exact-integer-valued doubles. */
  private def microCol(vecCol: String, offset: Double): Column = {
    val m = transform(col(vecCol).cast("array<double>"),
      x => floor((x + lit(offset)) * lit(1000000.0)).cast("double"))
    when(exists(m, e => e < 0.0), raise_error(lit(
        "KMeansFixed: negative coordinate after offset — raise `offset`" +
          " (non-negativity is the cross-engine division invariant)")))
      .otherwise(m)
  }

  /** Exact squared L2 to a centroid literal via the codegen dot:
    * requires the precomputed `m2` = ⟨m,m⟩ column.
    */
  private def distTo(m: Column, m2: Column, c: Array[Long]): Column = {
    val lc = array(c.map(v => lit(v.toDouble)).toIndexedSeq: _*)
    val c2 = c.foldLeft(0L)((acc, v) => acc + v * v).toDouble
    m2 - lit(2.0) * Similarity.dotD(m, lc) + lit(c2)
  }

  /** Row-local nearest-centroid id. Ties go to the lower cell:
    * array_position returns the FIRST index holding the minimum, and
    * the distances are exact integer-valued doubles so "equal" is
    * exact, not a float accident.
    */
  private def assignCol(m: Column, m2: Column,
      cs: Array[Array[Long]]): Column = {
    val ds = array(cs.map(c => distTo(m, m2, c)).toIndexedSeq: _*)
    (array_position(ds, array_min(ds)) - 1).cast("long")
  }

  /** Fit k clusters with `iters` exact Lloyd rounds. Initial
    * centroids are the `k` lowest-id vectors (the deterministic
    * IVF-flat bootstrap). Returns the final centroids (integer
    * micros) and the final assignment (id, cell, m, m2).
    */
  def fit(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, offset: Double = 1.0): Model = {
    require(k > 0 && iters >= 0, s"k=$k iters=$iters")
    val mat = Materializer.of(vecs.sparkSession)
    val quant = mat.eager(vecs
      .select(col(idCol).cast("long").as("id"),
        microCol(vecCol, offset).as("m"))
      .withColumn("m2", Similarity.dotD(col("m"), col("m"))))
    var cs: Array[Array[Long]] = quant.orderBy(col("id")).limit(k)
      .select(col("m")).collect()
      .map(_.getSeq[Double](0).map(_.toLong).toArray)
    require(cs.length == k,
      s"k=$k but only ${cs.length} vectors to seed from")
    for (_ <- 1 to iters) {
      val sums = quant
        .select(assignCol(col("m"), col("m2"), cs).as("cell"),
          posexplode(col("m")).as(Seq("pos", "val")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("val").cast("long")).as("s"), count(lit(1)).as("cnt"))
        .collect()
      val next = cs.map(_.clone())
      sums.foreach { r =>
        val (cell, pos) = (r.getLong(0).toInt, r.getInt(1))
        next(cell)(pos) = r.getLong(2) / r.getLong(3)
      }
      cs = next
    }
    Model(cs, quant.select(col("id"),
      assignCol(col("m"), col("m2"), cs).as("cell"), col("m"), col("m2")))
  }

  /** Gate-shaped summary: one row per (cell, dim) with the centroid
    * coordinate plus the cell's member count and exact inertia
    * (Σ squared distance of members to the FINAL centroid).
    */
  def summary(model: Model): DataFrame = {
    val spark = model.assigned.sparkSession
    import spark.implicits._
    // distance to own centroid needs the per-cell literal: build as a
    // CASE over the k cells (config-sized expression)
    val distOwn = model.centroids.zipWithIndex.foldLeft(lit(null)
        .cast("double")) { case (acc, (c, i)) =>
      when(col("cell") === i.toLong, distTo(col("m"), col("m2"), c))
        .otherwise(acc)
    }
    val perCell = model.assigned
      .select(col("cell"), distOwn.as("d"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"),
        sum(col("d").cast("decimal(38,0)")).cast("long").as("inertia"))
    val cents = model.centroids.zipWithIndex.flatMap { case (c, i) =>
      c.zipWithIndex.map { case (v, j) =>
        (i.toLong, (j + 1).toLong, v) }
    }.toSeq.toDF("cell", "dim", "centroid_micro")
    cents.join(perCell, Seq("cell"), "left")
      .select(col("cell"), coalesce(col("n"), lit(0L)).as("n"),
        col("dim"), col("centroid_micro"),
        coalesce(col("inertia"), lit(0L)).as("inertia"))
  }
}
