package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A23: interval (time-window) join — all (left, right) pairs with the
  * same key and 0 <= rightTs - leftTs <= maxDelta. The event
  * correlation primitive (click->purchase attribution, flow
  * correlation inside a detection window) that a naive engine writes
  * as an inequality join — which Spark would execute as a per-key
  * cartesian product with a post-filter.
  *
  * Scale shape: time is bucketized at the window size; a right row in
  * bucket b can only match left rows in buckets {b-1, b}, so the LEFT
  * side is exploded into (bin, bin+1) and the join is a pure equi-join
  * on (key, bin) — shuffle-partitionable, sort-merge/AQE friendly, 2x
  * left fanout, and each qualifying pair is produced exactly once
  * (the right row's bin is unique). Work is proportional to true
  * temporal collisions, never |L| x |R| per key.
  */
object IntervalJoin {

  /** `left`/`right` must share only the key column name; timestamp
    * columns are timestamps (micros precision). Output appends
    * `delta_us` to the joined columns.
    */
  def forwardWindow(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, maxDeltaUs: Long): DataFrame = {
    require(maxDeltaUs > 0, s"invalid maxDeltaUs=$maxDeltaUs")
    val l = left
      .withColumn("__lus", unix_micros(col(leftTs)))
      .withColumn("__bin",
        explode(array(expr(s"__lus DIV ${maxDeltaUs}L"),
          expr(s"__lus DIV ${maxDeltaUs}L + 1L"))))
    val r = right
      .withColumn("__rus", unix_micros(col(rightTs)))
      .withColumn("__bin", expr(s"__rus DIV ${maxDeltaUs}L"))
    l.join(r, Seq(keyCol, "__bin"))
      .filter(col("__rus") >= col("__lus") &&
        col("__rus") - col("__lus") <= maxDeltaUs)
      .withColumn("delta_us", col("__rus") - col("__lus"))
      .drop("__lus", "__rus", "__bin")
  }
}
