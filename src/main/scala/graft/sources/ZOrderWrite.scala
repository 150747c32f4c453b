package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ZOrder

/** Z-order clustered layout (SURVEY.md §5): range-partition + sort on
  * the interleaved key of two filter columns, so every output file
  * covers a narrow range in BOTH dimensions and min/max footer stats
  * prune scans filtered on either column — the data-layout operator
  * (Delta/Iceberg OPTIMIZE ZORDER BY) that keeps a 100 TB table
  * scannable by more than one predicate.
  *
  * Scale shape: the column domains come from one scalar aggregate
  * (broadcast-sized), the z-value is a codegen'd expression, and
  * `repartitionByRange` samples the z-key to build balanced
  * boundaries — no global sort, one shuffle, `numPartitions` output
  * files of even size.
  */
object ZOrderWrite {

  /** df re-clustered into `numPartitions` z-ordered partitions on
    * (colA, colB); each partition is internally z-sorted so row-group
    * stats stay tight within files too.
    */
  def cluster(df: DataFrame, colA: String, colB: String,
      numPartitions: Int): DataFrame = {
    val r = df.agg(
      min(col(colA)).cast("long").as("amn"), max(col(colA)).cast("long").as("amx"),
      min(col(colB)).cast("long").as("bmn"), max(col(colB)).cast("long").as("bmx"))
      .head()
    // empty input (or all-null cluster columns): the global min/max row
    // is all nulls — nothing to cluster, hand back the frame unchanged
    // (a periodic compaction job hitting an empty table must not crash)
    if (r.isNullAt(0) || r.isNullAt(2)) return df
    val z = ZOrder.z2(
      ZOrder.bucket16(col(colA), lit(r.getLong(0)), lit(r.getLong(1))),
      ZOrder.bucket16(col(colB), lit(r.getLong(2)), lit(r.getLong(3))))
    df.repartitionByRange(numPartitions, z).sortWithinPartitions(z)
  }

  /** Cluster and write as parquet: `numPartitions` files, each tight
    * in both dimensions.
    */
  def write(df: DataFrame, path: String, colA: String, colB: String,
      numPartitions: Int): Unit =
    cluster(df, colA, colB, numPartitions)
      .write.mode("overwrite").parquet(path)
}
