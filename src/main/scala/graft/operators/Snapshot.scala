package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot management (SURVEY.md §2.3 P7): diff two versions
  * of a corpus — the audit every pipeline run does before promoting a
  * new snapshot ("what did this run actually change?").
  */
object Snapshot {

  /** Per-doc classification of `next` against `prev`: `added` (id only
    * in next), `removed` (id only in prev), `changed` (same id,
    * different content hash), `unchanged`.
    *
    * Scale shape: contents compare by md5, never by text, so the
    * shuffle carries (id, 16-byte hash) — one id-keyed full outer
    * join at ~24 bytes/row regardless of document size.
    */
  def diff(prev: DataFrame, next: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val p = prev.select(col(idCol).as("doc_id"), md5(col(textCol)).as("__ph"))
    val n = next.select(col(idCol).as("doc_id"), md5(col(textCol)).as("__nh"))
    p.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("__ph").isNull, "added")
          .when(col("__nh").isNull, "removed")
          .when(col("__ph") =!= col("__nh"), "changed")
          .otherwise("unchanged").as("change"))
  }

  /** The one-line audit summary: row counts per change class. */
  def diffSummary(prev: DataFrame, next: DataFrame,
      idCol: String, textCol: String): DataFrame =
    diff(prev, next, idCol, textCol)
      .groupBy(col("change")).agg(count(lit(1)).as("n_docs"))
}
