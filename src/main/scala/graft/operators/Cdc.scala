package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A64/A65: change-data management — applying a changelog to a
  * snapshot (the MERGE a lakehouse table maintenance job runs) and
  * building SCD2 validity history from a change stream (the
  * as-of-queryable form of a mutating dimension). The data-management
  * counterpart of the snapshot DIFF (P7): P7 reports what changed
  * between two materialized corpora, these two operators produce the
  * next corpus and its history.
  */
object Cdc {

  /** A64: latest-version-wins changelog application. `changelog`
    * carries the snapshot's payload columns plus (`versionCol`,
    * `opCol`); snapshot rows join at version `baseVersion` as
    * upserts. Per key, the row with the highest version wins (ONE
    * map-side-combinable max_by aggregation — no window sort);
    * winners whose op equals `deleteOp` drop. Contract: versions are
    * unique per key (a version tie has no defined winner and RAISES
    * rather than picking one silently).
    *
    * Scale shape: one union + one hash aggregation keyed by the
    * merge key — the changelog never joins the snapshot row-by-row,
    * so a small changelog against a 100 TB snapshot still scans the
    * snapshot exactly once with map-side partial aggregation.
    */
  def applyChangelog(snapshot: DataFrame, changelog: DataFrame,
      keyCol: String, versionCol: String, opCol: String,
      deleteOp: String = "delete", baseVersion: Long = 0L): DataFrame = {
    val payload = snapshot.columns.filter(_ != keyCol).toSeq
    require(payload.nonEmpty, "snapshot needs payload columns")
    val clPayload = changelog.columns
      .filterNot(Seq(keyCol, versionCol, opCol).contains).toSeq
    require(clPayload.sorted == payload.sorted,
      s"changelog payload ${clPayload.sorted} != snapshot ${payload.sorted}")
    val snap = snapshot
      .withColumn(versionCol, lit(baseVersion))
      .withColumn(opCol, lit("upsert"))
    val all = snap.unionByName(changelog)
    val row = struct((col(versionCol) +: col(opCol) +:
      payload.map(col)): _*)
    // The duplicate-version raise is embedded in the ONE filter
    // predicate (not a separate conjunct): evaluating "keep this key?"
    // forces the guard first, so a top-version tie raises even when the
    // max_by winner is a delete that would otherwise drop the key
    // silently — no reliance on Catalyst's conjunct evaluation order.
    val guardedOp = when(col("__n") =!= col("__nv"), raise_error(lit(
        "applyChangelog: duplicate version for a key — no defined " +
          "winner; assign unique versions per key")))
      .otherwise(col(s"__w.$opCol"))
    all.groupBy(col(keyCol))
      .agg(max_by(row, col(versionCol)).as("__w"),
        count(lit(1)).as("__n"),
        count_distinct(col(versionCol)).as("__nv"))
      .filter(guardedOp =!= lit(deleteOp))
      .select(col(keyCol) +: col(s"__w.$versionCol").as(versionCol) +:
        payload.map(c => col(s"__w.$c").as(c)): _*)
  }

  /** A65: SCD2 history from a change stream — collapse consecutive
    * rows with an unchanged tracked value, then assign each surviving
    * row its validity interval `[valid_from, valid_to)` (`valid_to`
    * NULL = current, `is_current` = 1). Two windows over the key
    * partition, ordered by (`tsCol`, `tieCol`): the change filter
    * (null-safe lag comparison, so a NULL tracked value is a real
    * state, not a wildcard) and the lead for the closing bound. The
    * as-of join (A13) answers "value at time t" against this table
    * with a plain range predicate.
    */
  def scd2(changes: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "need at least one tracked column")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val v = struct(valueCols.map(col): _*)
    val changed = changes
      .withColumn("__prev", lag(v, 1).over(w))
      // null-safe: first row (__prev NULL) survives; equal structs drop
      .filter(!v.eqNullSafe(col("__prev")))
      .drop("__prev")
    val w2 = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    changed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull.cast("int"))
      .select(col(keyCol) +: valueCols.map(col) :+
        col("valid_from") :+ col("valid_to") :+ col("is_current"): _*)
  }
}
