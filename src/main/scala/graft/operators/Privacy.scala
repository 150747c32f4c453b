package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C5: k-anonymity / l-diversity audit — the release-governance
  * counterpart of the PII scrubber (T6): T6 redacts identifiers
  * INSIDE text, this measures re-identification risk in the
  * STRUCTURED columns a dataset ships alongside it. A row is
  * k-anonymous when at least k rows share its quasi-identifier (QI)
  * combination; a QI group is l-diverse when the sensitive attribute
  * takes at least l distinct values inside it (k alone fails the
  * homogeneity attack: a group of 50 that all share the sensitive
  * value re-identifies it perfectly).
  *
  * Shape: ONE hash aggregation on the QI columns (map-side
  * combinable counts + distinct-sensitive), output bounded by the QI
  * vocabulary product, never the row count — the audit of a 100 TB
  * release costs one pass. All-integer outputs; no float anywhere.
  */
object Privacy {

  /** Per-QI-combination audit: group size `n`, distinct sensitive
    * values `l_diversity`, and `at_risk` = 1 where n < k (the rows a
    * release would need to generalize or suppress).
    */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], sensitive: Column,
      k: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k=$k (want >= 1)")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        count_distinct(sensitive).as("l_diversity"))
      .withColumn("at_risk", (col("n") < k).cast("int"))
  }

  /** Corpus-level rollup of [[kAnonymity]]: how many QI groups and
    * rows sit below k, the worst (smallest) group, and the minimum
    * l-diversity — the four numbers a release gate actually checks.
    */
  def kAnonymitySummary(df: DataFrame, qiCols: Seq[String],
      sensitive: Column, k: Long): DataFrame =
    kAnonymity(df, qiCols, sensitive, k)
      .agg(count(lit(1)).as("n_groups"),
        sum(col("at_risk")).as("groups_at_risk"),
        sum(when(col("at_risk") === 1, col("n")).otherwise(0L))
          .as("rows_at_risk"),
        min(col("n")).as("min_group_size"),
        min(col("l_diversity")).as("min_l_diversity"))
}
