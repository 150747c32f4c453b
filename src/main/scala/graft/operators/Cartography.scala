package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** E2: embedding-space cartography — per-group centroid and
  * compactness diagnostics (the statistics behind centroid-based data
  * pruning / SemDeDup-style curation: a group whose vectors hug their
  * centroid is redundant; one that spreads is diverse). Reported per
  * group: size, dimensionality, centroid norm, and the mean/min cosine
  * of members to their own centroid.
  *
  * Determinism: a naive float centroid is partition-order-dependent
  * (double sums are not associative). Each component is summed as
  * decimal(28,10) — exact, order-independent — rounded to 6 decimals
  * while still decimal, double-cast (single correctly-rounded step),
  * then divided by the group count in IEEE double: every engine
  * computing the same arithmetic gets the same centroid bit-for-bit
  * (same discipline as Shared.avg4). Member cosines use the
  * sequential-fold dot kernel and are rounded to 6 before the final
  * (again decimal-exact) mean.
  *
  * Scale shape: the component explode fans rows out by `dim`, but the
  * (group, dim) aggregation partial-aggregates map-side down to
  * |groups| x dim rows before the one shuffle; centroids are a tiny
  * table broadcast back onto the vectors; the final per-group agg is
  * one more keyed shuffle. No pairwise anything — compactness via
  * centroid cosine is O(N·dim), which is why this diagnostic (and not
  * mean pairwise similarity) is what runs at 100 TB.
  */
object Cartography {

  def centroidStats(df: DataFrame, idCol: String, vecCol: String,
      groupCol: String): DataFrame = {
    val vecs = df.select(col(groupCol).as("grp"), col(idCol).as("vec_id"),
      col(vecCol).cast("array<double>").as("v"))
    val comps = vecs
      .select(col("grp"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("grp"), col("dim"))
      .agg((round(sum(col("x").cast("decimal(28,10)")), 6).cast("double") /
        count(col("x"))).as("comp"))
    val centroids = comps
      .groupBy(col("grp"))
      .agg(array_sort(collect_list(struct(col("dim"), col("comp")))).as("cs"))
      .select(col("grp"), transform(col("cs"), c => c("comp")).as("cv"))
      .withColumn("centroid_norm",
        round(sqrt(Similarity.dotD(col("cv"), col("cv"))), 6))
    vecs.join(broadcast(centroids), "grp")
      .withColumn("cos", round(
        Similarity.cosine(Similarity.dotD(col("v"), col("cv")),
          Similarity.dotD(col("v"), col("v")),
          Similarity.dotD(col("cv"), col("cv"))), 6))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_vecs"),
        max(size(col("v"))).cast("long").as("dim"),
        max(col("centroid_norm")).as("centroid_norm"),
        round(round(sum(col("cos").cast("decimal(28,10)")), 6).cast("double") /
          count(col("cos")), 4).as("avg_cos"),
        min(col("cos")).as("min_cos"))
  }
}
