package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, PipelineQueries, ReferenceQueries}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory each
  * entry implements.
  */
object SparkEntry {

  /** Flagship: the reference's end-to-end hostgroup/threshold pipeline
    * (/root/reference/main.go:212-444) on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    ReferenceQueries.qThresholds(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ReferenceQueries.queries ++ AnalyticsQueries.queries ++ PipelineQueries.queries

  /** DuckDB-equivalent SQL per query (driver correctness gate). */
  def oracleSql: Map[String, String] =
    ReferenceQueries.oracleSqlAll ++ AnalyticsQueries.oracleSql ++ PipelineQueries.oracleSql
}
