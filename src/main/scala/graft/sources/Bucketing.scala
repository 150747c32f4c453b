package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables: pre-shuffled storage so equi-joins and
  * aggregations on the bucket key run with NO exchange at read time.
  * At 100 TB this converts the dominant cost of a fact-fact join
  * (shuffling both sides) into a one-time cost paid at write time —
  * the Spark-native analog of ClickHouse's sharding key locality the
  * reference relies on implicitly.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table in the session
    * catalog. Join/agg keys must equal the bucket key to elide the
    * exchange.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Equi-join two tables from the catalog on `key` — when both are
    * bucketed on `key` with the same bucket count, the physical plan
    * has no shuffle on either side (verified in the test suite).
    */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
