package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Streaming counterparts of the stateless curation operators
  * (SURVEY.md §2.3 P2/P3/P5) — the continuous half of the
  * profile-then-filter split a live ingest pipeline runs.
  *
  * hashSplit and stratifiedSample are pure row-local hash projections,
  * so they apply to a streaming DataFrame UNCHANGED (no counterpart
  * needed). Source mixing is the one that needs a design decision: the
  * batch operator derives per-source keep-thresholds from corpus
  * counts, which an unbounded stream cannot aggregate. The streaming
  * shape is: profile a batch snapshot (Sampling.mixProfile) -> each
  * micro-batch broadcast-joins the static threshold table -> the same
  * deterministic id-hash cut keeps rows. Stateless, exactly-once
  * under replay (a row's fate never depends on arrival order), and the
  * kept stream equals the batch mixSample of the same rows whenever
  * the profile matches.
  */
object StreamingCuration {

  /** Apply a mix-threshold profile (from [[Sampling.mixProfile]]) to a
    * stream. Sources absent from the profile (new sources appearing
    * after profiling) keep `defaultThr` permillion — 0 drops them
    * until the next re-profile, 1000000 passes them through.
    */
  def mixFilter(stream: DataFrame, idCol: String, sourceCol: String,
      profile: DataFrame, defaultThr: Long = 0L,
      salt: String = "mix"): DataFrame =
    stream.withColumn("__src", Sampling.keyOf(col(sourceCol)))
      .join(broadcast(profile), Seq("__src"), "left")
      .filter(Sampling.bucketOf(col(idCol), salt, 1000000)
        < coalesce(col("__thr"), lit(defaultThr)))
      .drop("__src", "__thr")

  /** P8 on a stream: apply a quality-weighted sampling profile (from
    * [[Sampling.weightedProfile]], computed over a batch snapshot) to
    * a live stream — one broadcast join plus row-local math, zero
    * streaming state. The kept stream equals the batch weightedSample
    * of the same rows whenever the profile matches (spec-pinned).
    */
  def weightedFilter(stream: DataFrame, idCol: String,
      weight: org.apache.spark.sql.Column, profile: DataFrame,
      salt: String = "wsample"): DataFrame =
    Sampling.weightedFilter(stream, idCol, weight, profile, salt)
}
