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
  * every Lloyd step is exact integer arithmetic — squared-L2 in
  * longs, centroid update `sum div count` — identical on any engine,
  * any partitioning, any core count.
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
  * Ladder bound (documented, not checked per-row): |micro| must stay
  * ≤ ~2^31 per coordinate so a d-dimensional squared distance fits a
  * long (d ≤ ~4096 at full 2^31 magnitude); embedding-scale inputs
  * (|x| ≤ ~1e3) are orders of magnitude inside it.
  *
  * Empty cells keep their previous centroid (reported with n = 0) —
  * the standard Lloyd convention, and the one a SQL LEFT JOIN
  * reproduces exactly.
  */
object KMeansFixed {

  final case class Model(centroids: Array[Array[Long]], assigned: DataFrame)

  private def microCol(vecCol: String, offset: Double): Column = {
    val m = transform(col(vecCol).cast("array<double>"),
      x => floor((x + lit(offset)) * lit(1000000.0)).cast("long"))
    when(exists(m, e => e < 0L), raise_error(lit(
        "KMeansFixed: negative coordinate after offset — raise `offset`" +
          " (non-negativity is the cross-engine division invariant)")))
      .otherwise(m)
  }

  private def distTo(m: Column, c: Array[Long]): Column = {
    val lc = array(c.map(lit).toIndexedSeq: _*)
    aggregate(zip_with(m, lc, (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)
  }

  /** Row-local nearest-centroid id. Ties go to the lower cell:
    * array_position returns the FIRST index holding the minimum, and
    * the distances are exact longs so "equal" is exact, not a float
    * accident.
    */
  private def assignCol(m: Column, cs: Array[Array[Long]]): Column = {
    val ds = array(cs.map(c => distTo(m, c)).toIndexedSeq: _*)
    (array_position(ds, array_min(ds)) - 1).cast("long")
  }

  /** Fit k clusters with `iters` exact Lloyd rounds. Initial
    * centroids are the `k` lowest-id vectors (the deterministic
    * IVF-flat bootstrap). Returns the final centroids (integer
    * micros) and the final assignment (id, cell, m).
    */
  def fit(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, offset: Double = 1.0): Model = {
    require(k > 0 && iters >= 0, s"k=$k iters=$iters")
    val mat = Materializer.of(vecs.sparkSession)
    val quant = mat.eager(vecs.select(col(idCol).cast("long").as("id"),
      microCol(vecCol, offset).as("m")))
    var cs: Array[Array[Long]] = quant.orderBy(col("id")).limit(k)
      .select(col("m")).collect().map(_.getSeq[Long](0).toArray)
    require(cs.length == k,
      s"k=$k but only ${cs.length} vectors to seed from")
    for (_ <- 1 to iters) {
      val sums = quant
        .select(assignCol(col("m"), cs).as("cell"),
          posexplode(col("m")).as(Seq("pos", "val")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("val")).as("s"), count(lit(1)).as("cnt"))
        .collect()
      val next = cs.map(_.clone())
      sums.foreach { r =>
        val (cell, pos) = (r.getLong(0).toInt, r.getInt(1))
        next(cell)(pos) = r.getLong(2) / r.getLong(3)
      }
      cs = next
    }
    Model(cs, quant.select(col("id"), assignCol(col("m"), cs).as("cell"),
      col("m")))
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
        .cast("long")) { case (acc, (c, i)) =>
      when(col("cell") === i.toLong, distTo(col("m"), c)).otherwise(acc)
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
