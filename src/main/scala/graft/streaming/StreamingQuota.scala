package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of Sampling.quotaSample (P9): maintain EXACTLY the
  * n-per-stratum deterministic quota over an unbounded ingest stream.
  *
  * The batch operator keeps the n smallest (md5(salt_id), id) pairs
  * per stratum — a selection that is a pure function of the SET of
  * rows seen, not their order or batching. So a bounded sorted buffer
  * of n pairs per stratum (state: n strings + n longs, forever)
  * converges to the IDENTICAL quota set the batch operator picks on
  * the same corpus — asserted set-for-set in the spec, not just
  * statistically. Late or replayed rows are harmless: insertion is
  * idempotent (same hash, same id).
  *
  * Each micro-batch emits the stratum's refreshed quota (Update
  * mode) whenever it changed.
  */
object StreamingQuota {

  final case class Doc(src: String, id: Long)

  final case class Kept(src: String, pos: Int, id: Long)

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  def quota(docs: Dataset[Doc], n: Int,
      salt: String = "quota"): Dataset[Kept] = {
    require(n > 0, s"invalid quota n=$n")
    val spark = docs.sparkSession
    import spark.implicits._

    // state: the kept (hash, id) pairs, sorted ascending, size <= n
    def update(src: String, it: Iterator[Doc],
        state: GroupState[List[(String, Long)]]): Iterator[Kept] = {
      var buf = state.getOption.getOrElse(Nil)
      var changed = false
      it.foreach { d =>
        val entry = (md5Hex(s"${salt}_${d.id}"), d.id)
        if (!buf.contains(entry)) {
          val merged = (entry :: buf).sorted
          val kept = merged.take(n)
          if (kept != buf) { buf = kept; changed = true }
        }
      }
      state.update(buf)
      if (!changed) Iterator.empty
      else buf.iterator.zipWithIndex.map { case ((_, id), pos) =>
        Kept(src, pos, id) }
    }

    docs.groupByKey(_.src)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
  }
}
