package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.Moments

/** E3bs: streaming per-group moment matrices — the live twin of
  * [[graft.operators.Pca.momentsViaAggBy]] (E3b), completing the
  * batch/streaming pairing the drift family already has: the per-group
  * (n, Σx, Σx·xᵀ) state a PCA/anisotropy monitor reads continuously
  * instead of rescanning the corpus.
  *
  * State per group is EXACTLY the batch aggregate's buffer — one
  * Array[Long] of 1 + d(d+3) slots (count + d + d(d+1)/2 signed-128-bit
  * cells, ~34 KB at d=64), folded through the SAME
  * [[Moments.updateBuf]] kernel the batch TypedImperativeAggregate
  * runs. Because every cell is an exact integer sum, the fold is
  * ORDER-INDEPENDENT: any micro-batch split, arrival order, or
  * partitioning reproduces the identical buffer, so a streamed matrix
  * equals a batch-built matrix over the same rows TO THE LAST BIT
  * (spec-asserted — the float fold this replaces could not make that
  * promise across splits). No watermark needed: state is bounded by
  * groups × d², never by rows, and "late" data is simply more data —
  * moments have no event-time window to violate.
  *
  * Each micro-batch emits the group's refreshed matrix row (Update
  * mode): the same (n, sx, sxy) triple the batch struct carries, with
  * the same scale-6 HALF_UP display rounding.
  */
object StreamingMoments {

  final case class Vec(grp: String, vec: Seq[Double])

  final case class MomentsRow(grp: String, n: Long, sx: Seq[Double],
      sxy: Seq[Double])

  def moments(vecs: Dataset[Vec], dim: Int): Dataset[MomentsRow] = {
    require(dim > 0, s"dim=$dim (want > 0)")
    val spark = vecs.sparkSession
    import spark.implicits._

    def update(grp: String, it: Iterator[Vec],
        state: GroupState[Array[Long]]): Iterator[MomentsRow] = {
      val buf = state.getOption.getOrElse(new Array[Long](Moments.bufLen(dim)))
      it.foreach(r => Moments.updateBuf(buf, r.vec.toArray, dim))
      state.update(buf)
      Iterator.single(MomentsRow(grp, buf(0),
        Moments.evalSx(buf, dim).toSeq, Moments.evalSxy(buf, dim).toSeq))
    }

    vecs.groupByKey(_.grp)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
  }
}
