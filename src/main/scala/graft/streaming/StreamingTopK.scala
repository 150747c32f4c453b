package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the exact top-k-by-value aggregate
  * (`graft.functions.TopKAgg`): a continuously maintained per-group
  * leaderboard with a bounded k-element heap of state per group no
  * matter how long the stream runs — the live "top flows / largest
  * documents" panel next to the batch aggregate.
  *
  * Same ordering contract as the batch TypedImperativeAggregate:
  * (value DESC, id ASC), null-free input assumed (the batch doc
  * spells out the null/NaN normalization contract), and the SAME
  * eviction arithmetic — the heap's head is the worst kept element
  * under `(value ASC, id DESC)`, so a new row displaces it exactly
  * when the batch update() would. The spec pins stream == batch on
  * identical input across micro-batch splits.
  *
  * Every micro-batch re-emits each touched group's refreshed
  * leaderboard (Update mode), one row per position.
  */
object StreamingTopK {

  final case class Scored(grp: String, id: Long, value: Double)

  final case class TopRow(grp: String, pos: Int, id: Long, value: Double)

  def topK(rows: Dataset[Scored], k: Int): Dataset[TopRow] = {
    require(k > 0, s"invalid k=$k")
    val spark = rows.sparkSession
    import spark.implicits._

    // worst-first ordering: head = smallest value, ties broken so the
    // LARGER id evicts first (matches value DESC, id ASC retention).
    // Deliberately NOT implicit — an implicit Ordering[(Double, Long)]
    // in scope would also capture sortBy's (-value, id) key below and
    // invert the emitted leaderboard.
    val worstFirst: Ordering[(Double, Long)] =
      Ordering.fromLessThan[(Double, Long)] { case ((v1, i1), (v2, i2)) =>
        v1 > v2 || (v1 == v2 && i1 < i2)
      }

    def update(grp: String, it: Iterator[Scored],
        state: GroupState[Seq[(Double, Long)]]): Iterator[TopRow] = {
      val heap = mutable.PriorityQueue.empty[(Double, Long)](worstFirst)
      heap ++= state.getOption.getOrElse(Seq.empty)
      it.foreach { r =>
        if (heap.size < k) heap.enqueue((r.value, r.id))
        else {
          val worst = heap.head
          if (r.value > worst._1 || (r.value == worst._1 && r.id < worst._2)) {
            heap.dequeue(); heap.enqueue((r.value, r.id))
          }
        }
      }
      val kept = heap.toSeq
      state.update(kept)
      kept.sortBy { case (v, i) => (-v, i) }.zipWithIndex.iterator
        .map { case ((v, i), pos) => TopRow(grp, pos, i, v) }
    }

    rows
      .groupByKey(_.grp)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
  }

  /** Column-name adapter from a raw frame. */
  def topK(df: DataFrame, grpCol: String, idCol: String, valueCol: String,
      k: Int): Dataset[TopRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    topK(df.select(col(grpCol).cast("string").as("grp"),
      col(idCol).cast("long").as("id"),
      col(valueCol).cast("double").as("value")).as[Scored], k)
  }
}
