package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join — for each left row, the latest right row with
  * right_ts <= left_ts on the same key. Spark has no native as-of
  * join; composing one from a range join would probe every right row
  * per left row. Instead: tag both sides, union, and carry the right
  * payload forward with a last(ignoreNulls) running window — ONE
  * shuffle on the key, one ordered scan per key, O(|L|+|R|) work.
  * That is the plan shape that survives 100 TB (state per key is one
  * row, skew bounded by key cardinality like any keyed window).
  */
object AsofJoin {

  /** `left` and `right` must have disjoint column names. Right rows
    * tied on (key, ts) are reduced to the one with the greatest
    * `rightTieBreak` first, so results are deterministic.
    */
  def leftAsof(
      left: DataFrame,
      right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightTieBreak: String): DataFrame = {
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq
    require(lCols.intersect(rCols).isEmpty,
      s"column collision: ${lCols.intersect(rCols)}")

    // deterministic right side: one row per (key, ts)
    val dedupW = Window.partitionBy(col(rightKey), col(rightTs))
      .orderBy(col(rightTieBreak).desc)
    val r1 = right
      .withColumn("__rn", row_number().over(dedupW))
      .filter(col("__rn") === 1)
      .drop("__rn")

    def nulls(df: DataFrame, cols: Seq[String]): Seq[Column] =
      cols.map(c => lit(null).cast(df.schema(c).dataType).as(c))

    // side 0 (right) sorts before side 1 (left) at equal timestamps,
    // making the join inclusive (right_ts <= left_ts)
    val rTagged = r1.select(
      Seq(col(rightKey).as("__key"), col(rightTs).as("__t"),
        lit(0).as("__side")) ++ nulls(left, lCols) ++ rCols.map(col): _*)
    val lTagged = left.select(
      Seq(col(leftKey).as("__key"), col(leftTs).as("__t"),
        lit(1).as("__side")) ++ lCols.map(col) ++ nulls(right, rCols): _*)

    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Carry the right row as ONE struct (null on left-side rows), so a
    // matched right row whose payload legitimately contains NULLs is
    // forwarded atomically — per-column fills would stitch together
    // fields from different right rows.
    val rRow = when(col("__side") === 0, struct(rCols.map(col): _*))
    val filled = rTagged.union(lTagged)
      .withColumn("__r", last(rRow, ignoreNulls = true).over(w))
    filled.filter(col("__side") === 1)
      .select(lCols.map(col) ++ rCols.map(c => col(s"__r.$c").as(c)): _*)
  }
}
