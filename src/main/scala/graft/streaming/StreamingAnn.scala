package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, Similarity}

/** Streaming ANN serving — the continuous counterpart of
  * `IvfIndex.search`: a live stream of query embeddings answered
  * against a STATIC IVF index (the "index built nightly, queries
  * served all day" deployment shape).
  *
  * Scale shape: everything per-query happens IN-ROW, because streaming
  * append mode allows no window functions and a per-query ranking
  * aggregation would need watermark state for no reason. The cell
  * choice is the batch kernel's own `IvfIndex.probeCells` (a
  * config-sized centroid literal sorted per row); the index side is
  * pre-grouped into one posting-list row per cell (`postings`), so
  * each micro-batch runs `nprobe` stream-static equi-joins on cell id
  * — nlist rows, broadcast-able, unhinted so the planner decides —
  * and then scoring, ranking, and top-k selection are higher-order
  * array expressions over the in-row candidate list: zero streaming
  * state, no watermark, unbounded-history safe.
  *
  * The per-cell posting array is ~|corpus|/nlist entries — the same
  * memory shape a native IVF server holds per cell; nlist sizing (and
  * the hot-cell guard of the build) bounds it. At 100 TB the postings
  * build is the nightly batch job; pass it through a
  * [[graft.operators.Materializer]] or persist it, because a
  * stream-static join re-runs the static subplan every micro-batch.
  *
  * The kernel is stream-agnostic (pure column programs), so the SAME
  * code path runs on a batch DataFrame — `q_ann_stream_topk` gates it
  * against the DuckDB oracle of the batch IVF search (IDENTICAL
  * selection: same cells probed, same sequential-fold cosines, same
  * ranking), and `StreamingAnnSpec` pins stream-vs-batch parity.
  */
object StreamingAnn {

  /** One posting-list row per cell: the cell's vectors packed as an
    * array of (vec_id, v, nrm2) structs. Build once per index (the
    * static side of every stream-static join); persist or materialize
    * for serving.
    */
  def postings(index: IvfIndex.Index): DataFrame =
    index.cells.groupBy(col("cell"))
      .agg(collect_list(struct(col("vec_id"), col("v"), col("nrm2")))
        .as("cands"))

  /** Descending cosine, ascending vec_id — the batch window's
    * (cos desc, vec_id) order as an array_sort comparator (comparator
    * instead of sign-flipped sort keys: negating a double flips -0.0
    * and NaN orderings; the comparator has no such edge).
    */
  private def byCosDesc(l: Column, r: Column): Column =
    when(l("cos") > r("cos"), -1)
      .when(l("cos") < r("cos"), 1)
      .when(l("vec_id") < r("vec_id"), -1)
      .when(l("vec_id") > r("vec_id"), 1)
      .otherwise(0)

  /** Top-k cosine neighbors for each query row of `stream`, searching
    * the `nprobe` nearest cells of the static index. Output schema and
    * selection are identical to `IvfIndex.search`.
    */
  def search(stream: DataFrame, index: IvfIndex.Index, postings: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val np = math.min(nprobe, index.centroids.length)
    var q = Similarity.withNorm(stream, idCol, vecCol)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm2").as("qn"))
      .withColumn("__cells",
        IvfIndex.probeCells(col("qv"), col("qn"), index.centroids, np))
    // one stream-static equi-join per probe slot (the streaming twin
    // of the batch explode-on-cell): left joins, because an empty cell
    // has no posting row
    for (p <- 0 until np) {
      q = q.withColumn(s"__cell_$p", element_at(col("__cells"), p + 1))
        .join(postings.select(col("cell").as(s"__cell_$p"),
          col("cands").as(s"__cands_$p")), Seq(s"__cell_$p"), "left")
    }
    val merged = flatten(filter(
      array((0 until np).map(p => col(s"__cands_$p")): _*),
      c => c.isNotNull))
    val scored = transform(
      filter(merged, c => c("vec_id") =!= col("query_id")),
      c => struct(
        Similarity.cosine(Similarity.dotD(col("qv"), c("v")),
          col("qn"), c("nrm2")).as("cos"),
        c("vec_id").as("vec_id")))
    q.select(col("query_id"),
        posexplode(slice(array_sort(scored, byCosDesc), 1, k)))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rnk"),
        col("col")("vec_id").as("neighbor_id"),
        round(col("col")("cos"), 6).as("cos"))
  }

  /** Convenience: build the postings inline (fine for tests and batch
    * gating; a serving deployment materializes them once instead).
    */
  def search(stream: DataFrame, index: IvfIndex.Index, idCol: String,
      vecCol: String, k: Int, nprobe: Int): DataFrame =
    search(stream, index, postings(index), idCol, vecCol, k, nprobe)
}
