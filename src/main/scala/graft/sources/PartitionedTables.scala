package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Hive-style partitioned parquet layout: one directory per partition
  * value, so filters on the partition column prune entire directories
  * at planning time — at 100 TB the difference between listing a few
  * directories and scanning everything. Verified in the test suite via
  * PartitionFilters in the physical scan.
  */
object PartitionedTables {

  def write(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write
      .mode("overwrite")
      .partitionBy(partitionCol)
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Read only the partitions matching `value` — the filter lands in
    * PartitionFilters (metadata pruning), not PushedFilters (row
    * groups), because the column is a directory name.
    */
  def readPartition(spark: SparkSession, path: String,
      partitionCol: String, value: String): DataFrame =
    read(spark, path).filter(col(partitionCol) === value)
}
