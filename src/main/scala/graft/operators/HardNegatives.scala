package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** G1: hard-negative mining (SURVEY.md §2.3) — the contrastive-
  * training data op: for each labeled query vector, the top-k most
  * cosine-similar corpus vectors whose label DIFFERS (near-misses the
  * model must learn to separate; same-label neighbors are positives,
  * not negatives, and are filtered before ranking so they never eat a
  * top-k slot).
  *
  * Scale shape is the S3 IVF search verbatim: queries probe their
  * `nprobe` nearest cells (centroid array is config-sized, probing is
  * a zero-shuffle row-local sort of a literal array), candidates come
  * from ONE cell-keyed join (Σ over probed cells, never corpus²), and
  * the label rides the index frame from the start ([[Similarity
  * .withNorm]] extra-column passthrough) — no corpus-sized label
  * join-back. The label filter lands BEFORE the rank window, so the
  * per-query frame the window sorts is already the negative set.
  */
object HardNegatives {

  /** Brute-force different-label top-k — the TRUTH arm for the
    * recall sweep (the S1/S4 convention: brute exists to measure the
    * bucketed arm, never to run at corpus scale). Same cosine, same
    * (cos DESC, id) tie order as [[mine]].
    */
  def brute(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    val n = Similarity.withNorm(corpus, idCol, vecCol, Seq(labelCol))
    val q = Similarity.withNorm(queries, idCol, vecCol, Seq(labelCol))
      .select(col("vec_id").as("query_id"), col(labelCol).as("__qlbl"),
        col("v").as("qv"), col("nrm2").as("qn"))
    val cos = Similarity.cosine(
      Similarity.dotD(col("qv"), col("v")), col("qn"), col("nrm2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    broadcast(q).join(n, col("__qlbl") =!= col(labelCol))
      .withColumn("cos", cos)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"),
        col("vec_id").as("neighbor_id"),
        col(labelCol).as("neighbor_label"),
        round(col("cos"), 6).as("cos"))
  }

  /** (query_id, rnk, neighbor_id, neighbor_label, cos) — top-k
    * different-label neighbors per query among the `nprobe` probed
    * IVF cells; ties (cos, then id) deterministic. `queries` must
    * carry the same id/vec/label columns as `corpus`.
    */
  def mine(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int, nlist: Int,
      nprobe: Int): DataFrame = {
    require(k > 0 && nlist > 0 && nprobe > 0,
      s"k=$k nlist=$nlist nprobe=$nprobe must all be positive")
    // deterministic IVF bootstrap (the S3/D9 device): centroids = the
    // nlist smallest-id corpus vectors; cells carry the label through
    val n = Similarity.withNorm(corpus, idCol, vecCol, Seq(labelCol))
    val centroids = n.orderBy(col("vec_id")).limit(nlist)
      .select(col("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    // cell assignment with the label inlined — the O(nlist) argmin
    // over a NAMED distance column (IvfIndex.withCell), not a per-row
    // sort and not the inline-Column form that computed the distance
    // array twice: this is the corpus-side hot path
    val cells = IvfIndex.withCell(n, centroids)
      .select(col("vec_id"), col("cell"), col("v"), col("nrm2"),
        col(labelCol).as("__lbl"))
    val q = Similarity.withNorm(queries, idCol, vecCol, Seq(labelCol))
      .select(col("vec_id").as("query_id"), col(labelCol).as("__qlbl"),
        col("v").as("qv"), col("nrm2").as("qn"))
      .withColumn("cell", explode(
        IvfIndex.probeCells(col("qv"), col("qn"), centroids,
          math.min(nprobe, centroids.length))))
    val cos = Similarity.cosine(
      Similarity.dotD(col("qv"), col("v")), col("qn"), col("nrm2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    broadcast(q).join(cells, Seq("cell"))
      .filter(col("__qlbl") =!= col("__lbl"))
      .withColumn("cos", cos)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"),
        col("vec_id").as("neighbor_id"),
        col("__lbl").as("neighbor_label"),
        round(col("cos"), 6).as("cos"))
  }

  /** [[mine]] at several `nprobe` settings in ONE physical pipeline
    * (the G2 sweep's hot path, r17 opt). The per-arm form re-collected
    * the centroids, re-assigned every corpus vector to its cell, and
    * paid a separate cell join + rank-window tower PER ARM; here the
    * centroid collect runs once, the cell-assigned corpus is planned
    * once, and all arms share a single cell-keyed join plus one
    * (nprobe, query)-keyed window. Arm np's slice is row-identical to
    * `mine(..., nprobe = np)` because [[IvfIndex.probeCells]] returns
    * cells sorted by (distance, cell id) — the first np entries of the
    * max-probe array ARE the np-probe set.
    */
  def mineSweep(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int, nlist: Int,
      probes: Seq[Int]): DataFrame = {
    require(k > 0 && nlist > 0 && probes.nonEmpty && probes.forall(_ > 0),
      s"k=$k nlist=$nlist probes=$probes must all be positive")
    val n = Similarity.withNorm(corpus, idCol, vecCol, Seq(labelCol))
    val centroids = n.orderBy(col("vec_id")).limit(nlist)
      .select(col("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    val cells = IvfIndex.withCell(n, centroids)
      .select(col("vec_id"), col("cell"), col("v"), col("nrm2"),
        col(labelCol).as("__lbl"))
    val maxP = math.min(probes.max, centroids.length)
    val q = Similarity.withNorm(queries, idCol, vecCol, Seq(labelCol))
      .select(col("vec_id").as("query_id"), col(labelCol).as("__qlbl"),
        col("v").as("qv"), col("nrm2").as("qn"))
      .select(col("query_id"), col("__qlbl"), col("qv"), col("qn"),
        posexplode(IvfIndex.probeCells(col("qv"), col("qn"), centroids, maxP))
          .as(Seq("__pos", "cell")))
      .withColumn("nprobe",
        explode(array(probes.map(p => lit(p.toLong)): _*)))
      .filter(col("__pos") < least(col("nprobe"), lit(centroids.length.toLong)))
    val cos = Similarity.cosine(
      Similarity.dotD(col("qv"), col("v")), col("qn"), col("nrm2"))
    val w = Window.partitionBy(col("nprobe"), col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    broadcast(q).join(cells, Seq("cell"))
      .filter(col("__qlbl") =!= col("__lbl"))
      .withColumn("cos", cos)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("nprobe"), col("query_id"), col("rnk"),
        col("vec_id").as("neighbor_id"),
        col("__lbl").as("neighbor_label"),
        round(col("cos"), 6).as("cos"))
  }
}
