package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** P12: cross-source overlap matrix — for every pair of corpus
  * sources, the exact Jaccard similarity of their distinct word-n-gram
  * shingle sets. The dataset-level view the per-document dedup family
  * (D1-D8) cannot give: "how much CONTENT do src_a and src_b share"
  * drives mixing weights (double-counted mass, P5), crawl-source
  * triage, and cross-source contamination reporting — before any
  * per-document pairing runs.
  *
  * Shape: the D2 shingle kernel ([[Dedup.shingleSets]]) keyed by
  * SOURCE instead of doc id, made distinct per source, then a
  * self-equi-join on the shingle hash. Fanout per shingle is bounded
  * by n_sources² (sources are an enumerable vocabulary, like event
  * types in A59 — NOT a df-cap situation: df per shingle is at most
  * n_sources after the distinct); the matrix is at most
  * n_sources·(n_sources-1)/2 rows. Counts are exact integers; the
  * single IEEE division per pair is display-only.
  *
  * Pairs sharing zero shingles emit no row (inner join) — absence
  * IS the answer, and materializing the zero cells would make the
  * operator's output quadratic in sources even when the corpus is
  * disjoint.
  */
object Overlap {

  def sourceOverlap(docs: DataFrame, srcCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    // materialized once: the self-join's two sides and the size table
    // would otherwise re-run the tokenize+hash+distinct pipeline three
    // times (the bandedHammingPairs rationale)
    val sets = Materializer.of(docs.sparkSession)(
      Dedup.shingleSets(docs, srcCol, textCol, n)
        .select(col("doc_id").as("src"), col("sh"))
        .distinct())
    val sizes = sets.groupBy("src").agg(count(lit(1)).as("n"))
    sets.select(col("src").as("src_a"), col("sh"))
      .join(sets.select(col("src").as("src_b"), col("sh")), Seq("sh"))
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_common"))
      .join(broadcast(sizes.select(col("src").as("src_a"),
        col("n").as("n_a"))), "src_a")
      .join(broadcast(sizes.select(col("src").as("src_b"),
        col("n").as("n_b"))), "src_b")
      .withColumn("jaccard", round(col("n_common") /
        (col("n_a") + col("n_b") - col("n_common")), 6))
      .select("src_a", "src_b", "n_common", "n_a", "n_b", "jaccard")
  }
}
