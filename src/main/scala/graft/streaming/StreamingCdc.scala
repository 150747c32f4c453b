package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A64s: streaming changelog application — the live materialized view
  * of [[graft.operators.Cdc.applyChangelog]]: per-key state is the
  * current winner (version + payload), refreshed as changelog rows
  * arrive; every touched key re-emits its row (Update mode), a delete
  * winner emits a tombstone (`is_deleted` = 1) so downstream sinks
  * can retract.
  *
  * Payload generality without per-schema state classes: rows enter as
  * (key, version, op, to_json(payload struct)) — the JSON string IS
  * the state payload, re-expanded by the consumer via from_json with
  * the known schema (spec-pinned roundtrip). State per key: one
  * (long, string, boolean) forever — bounded by the key universe,
  * exactly the table being materialized.
  *
  * Ordering: version decides, not arrival — a late lower-version row
  * never overwrites a higher-version state (idempotent under replay
  * and reordering, spec-pinned); an EQUAL version with different
  * content has no defined winner batch-side (the batch operator
  * raises) — here the incumbent wins and a `n_conflicts` counter
  * surfaces the violation (a stream cannot abort mid-flight the way
  * a batch job can; the meter is the honest alternative).
  */
object StreamingCdc {

  final case class Change(key: Long, version: Long, op: String,
      payload: String)

  final case class KeyState(key: Long, version: Long, payload: String,
      is_deleted: Int, n_conflicts: Long)

  /** (key, version, op, json payload) rows from a raw changelog frame
    * — the same column contract the batch operator takes, JSON-packed.
    */
  def changes(df: DataFrame, keyCol: String, versionCol: String,
      opCol: String): Dataset[Change] = {
    val spark = df.sparkSession
    import spark.implicits._
    val payload = df.columns
      .filterNot(Seq(keyCol, versionCol, opCol).contains).toSeq
    df.select(col(keyCol).cast("long").as("key"),
      col(versionCol).cast("long").as("version"),
      col(opCol).as("op"),
      to_json(struct(payload.map(col): _*)).as("payload"))
      .as[Change]
  }

  def materialize(stream: Dataset[Change],
      deleteOp: String = "delete"): Dataset[KeyState] = {
    val spark = stream.sparkSession
    import spark.implicits._

    def update(key: Long, rows: Iterator[Change],
        state: GroupState[(Long, String, Boolean, Long)])
        : Iterator[KeyState] = {
      var cur = state.getOption
      rows.foreach { c =>
        cur match {
          case Some((v, p, _, n)) if c.version > v =>
            cur = Some((c.version, c.payload, c.op == deleteOp, n))
          case Some((v, p, d, n))
              if c.version == v && (c.payload != p ||
                (c.op == deleteOp) != d) =>
            cur = Some((v, p, d, n + 1)) // conflict: incumbent wins
          case Some(_) => // lower version or exact duplicate: no-op
          case None =>
            cur = Some((c.version, c.payload, c.op == deleteOp, 0L))
        }
      }
      cur.foreach(state.update)
      cur.map { case (v, p, d, n) =>
        KeyState(key, v, p, if (d) 1 else 0, n)
      }.iterator
    }

    stream.groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
  }
}
