package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming twin of Profiling.columnProfile (A51): per-column running
  * (n_rows, n_null, approx_distinct) over an unbounded stream — the
  * live completeness panel next to the batch audit.
  *
  * Counts and null counts are EXACT (longs of aggregation state per
  * column); the distinct leg is approx_count_distinct — exact distinct
  * over a stream needs per-value state, which is exactly what a
  * 100 TB stream cannot hold, and the batch audit already publishes
  * the exact number nightly. The HLL band (relative sd 0.01 here) is
  * the spec's assertion, mirroring the A10 gate's discipline.
  *
  * Shape: one explode into (col_name, value-as-string, is_null) rows —
  * k tiny rows per input row, all columns in ONE pass — then a plain
  * streaming aggregate keyed by col_name (Update mode, partial
  * aggregation per micro-batch; state is one HLL + two longs per
  * column, bounded by construction). The string rendering is for the
  * uniform explode type only: it can conflate -0.0/0.0, which moves an
  * APPROXIMATE count by at most one — documented, not silent.
  */
object StreamingColumnProfile {

  def profile(rows: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    val entries: Seq[Column] = cols.map(c =>
      struct(lit(c).as("col_name"),
        col(c).cast("string").as("__v"),
        col(c).isNull.as("__isnull")))
    rows.select(explode(array(entries: _*)).as("e"))
      .select(col("e.col_name"), col("e.__v"), col("e.__isnull"))
      .groupBy(col("col_name"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("__isnull"), 1L).otherwise(0L)).as("n_null"),
        approx_count_distinct(col("__v"), 0.01).as("approx_distinct"))
  }
}
