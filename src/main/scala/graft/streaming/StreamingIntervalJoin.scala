package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Continuous counterpart of the batch interval join
  * (graft.operators.IntervalJoin): all (left, right) pairs with the
  * same key and 0 <= rightTs - leftTs <= maxDelta, over two live
  * streams.
  *
  * This is Spark's native stream-stream inner join with an event-time
  * range condition: the watermarks on BOTH inputs plus the time-range
  * predicate let the engine compute exactly how long a buffered left
  * row can still find matches, so join state is evicted continuously
  * and memory stays bounded no matter how long the streams run — the
  * property that makes the operator deployable, vs. an unbounded
  * buffer that dies after a week.
  */
object StreamingIntervalJoin {

  /** `left`/`right` must share only `keyCol`; both timestamp columns
    * are event time. Emits the joined rows plus `delta_us`.
    */
  def forwardWindow(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, maxDeltaSec: Long,
      watermarkDelay: String): DataFrame = {
    require(maxDeltaSec > 0, s"invalid maxDeltaSec=$maxDeltaSec")
    val l = left.withWatermark(leftTs, watermarkDelay).alias("l")
    val r = right.withWatermark(rightTs, watermarkDelay).alias("r")
    val cond: Column =
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") +
          expr(s"INTERVAL $maxDeltaSec SECONDS")
    val rightCols = right.columns.filterNot(_ == keyCol)
      .map(c => col(s"r.$c").as(c))
    val leftCols = left.columns.map(c => col(s"l.$c").as(c))
    l.join(r, cond)
      .select(leftCols ++ rightCols :+
        (unix_micros(col(s"r.$rightTs")) - unix_micros(col(s"l.$leftTs")))
          .as("delta_us"): _*)
  }
}
