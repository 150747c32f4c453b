package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SURVEY.md §2.3 — training-data pipeline operators (dedup, similarity,
  * text analysis, multimodal). Filled in incrementally; see Dedup.scala /
  * Similarity.scala / TextAnalysis.scala.
  */
object PipelineQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracleSql: Map[String, String] = Map()
}
