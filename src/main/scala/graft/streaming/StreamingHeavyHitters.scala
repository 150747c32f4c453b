package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming counterpart of the Misra-Gries heavy-hitters aggregate
  * (graft.functions.HeavyHitters): a continuously-maintained top-k of
  * a string column per group, with O(k) state per group no matter how
  * long the stream runs — the live "top talkers / top tokens" panel
  * next to the batch sketch.
  *
  * Same MG semantics as the batch TypedImperativeAggregate (insert
  * below capacity, decrement-all at capacity), so the same guarantees
  * hold per group: any item with frequency > n/(k+1) over the stream
  * so far is present, counts undercount by at most n/(k+1), and when
  * the group's distinct-item count never exceeds k the counts are
  * EXACT (asserted against the batch aggregate in the spec).
  *
  * Each micro-batch emits the group's refreshed top list (Update
  * mode); state never grows past k entries, so no watermark/timeout is
  * needed for boundedness.
  */
object StreamingHeavyHitters {

  final case class Item(grp: String, item: String)

  final case class TopItem(grp: String, pos: Int, item: String, count: Long)

  def topK(items: DataFrame, k: Int): Dataset[TopItem] = {
    require(k > 0, s"invalid k=$k")
    val spark = items.sparkSession
    import spark.implicits._

    def update(grp: String, rows: Iterator[Item],
        state: GroupState[Map[String, Long]]): Iterator[TopItem] = {
      val buf = mutable.HashMap.empty[String, Long]
      buf ++= state.getOption.getOrElse(Map.empty)
      rows.foreach { r =>
        buf.get(r.item) match {
          case Some(c) => buf.update(r.item, c + 1)
          case None if buf.size < k => buf.update(r.item, 1L)
          case None => // decrement-all step of Misra-Gries
            val dead = mutable.ArrayBuffer.empty[String]
            buf.keysIterator.foreach { it =>
              val c = buf(it) - 1
              if (c <= 0) dead += it else buf.update(it, c)
            }
            dead.foreach(buf.remove)
        }
      }
      state.update(buf.toMap)
      buf.toSeq.sortBy { case (it, c) => (-c, it) }.zipWithIndex.iterator
        .map { case ((it, c), pos) => TopItem(grp, pos, it, c) }
    }

    items.as[Item]
      .groupByKey(_.grp)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
  }
}
