package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Materializer}

/** The generic zero-state streaming band-match core behind
  * [[StreamingImageNearDup]] (M7s) and [[StreamingAudioNearDup]]
  * (M8s): a live stream of integer fingerprints matched against a
  * STATIC corpus fingerprint index with no streaming state at all —
  * the [[StreamingEr]]/ANN serving shape:
  *
  *   - corpus side, built once at query start: per band, a
  *     band-value -> candidate-id-array index (collect_set = the
  *     dedup a streaming `distinct` would need state for), plus the
  *     id -> hash table for verification;
  *   - stream side, all row-local: band the hash with plain bit ops
  *     into `nBands` columns, LEFT-join each band index, union the
  *     candidate arrays in-row, explode, join the hash table, one
  *     codegen'd bit_count Hamming check.
  *
  * With `nBands > maxHamming` the candidate generation is EXACT by
  * the same pigeonhole argument as the batch operator
  * ([[graft.operators.Dedup.bandedHammingPairs]]). Append mode,
  * unbounded-history safe; `maxBucket` caps corpus-side bucket width
  * (a flat fingerprint shared corpus-wide would otherwise ride into
  * every matching stream row's candidate array); `Dedup.AutoBucket`
  * auto-decides the cap from the hottest materialized band bucket.
  */
object StreamingHammingMatch {

  /** One APPEND row per (stream item, corpus item) pair within
    * `maxHamming` bits: (left_id, right_id, hamming). Inputs are
    * already-fingerprinted frames: `streamHashed` as
    * (left_id: Long, __lh: Long), `corpusHashed` as
    * (right_id: Long, __rh: Long).
    */
  def matchHashed(streamHashed: DataFrame, corpusHashed: DataFrame,
      totalBits: Int, maxHamming: Int, nBands: Int,
      maxBucket: Long): DataFrame = {
    // same sentinel contract as the batch band joins: 0 = uncapped,
    // > 0 = explicit cap, Dedup.AutoBucket = auto-decide; other
    // negatives reject loudly instead of silently disabling the guard
    require(maxBucket >= Dedup.AutoBucket,
      s"maxBucket=$maxBucket: 0 = uncapped, > 0 = explicit cap, " +
        s"${Dedup.AutoBucket} = auto")
    require(nBands > 0 && totalBits % nBands == 0,
      s"nBands=$nBands must divide $totalBits")
    val width = totalBits / nBands
    val mask = (1L << width) - 1L
    val mat = Materializer.of(corpusHashed.sparkSession)

    // static side: one fingerprint pass feeds the hash table AND
    // every band index
    val corpusH = mat(corpusHashed)
    val rawIdx = (0 until nBands).map { j =>
      mat(corpusH
        .withColumn(s"__bv_$j", shiftright(col("__rh"), width * j).bitwiseAND(lit(mask)))
        .groupBy(col(s"__bv_$j"))
        .agg(collect_set(col("right_id")).as(s"__cand_$j")))
    }
    // AutoBucket: the hottest bucket width is a max over the already
    // materialized per-band candidate arrays (no extra corpus pass);
    // the engage crossover is Dedup's (same conf keys)
    val cap =
      if (maxBucket == Dedup.AutoBucket) {
        val hottest = (0 until nBands).map { j =>
          val r = rawIdx(j).agg(max(size(col(s"__cand_$j")))).head()
          if (r.isNullAt(0)) 0L else r.getInt(0).toLong
        }.max
        Dedup.autoCapDecision(corpusHashed.sparkSession, hottest)
      } else maxBucket
    // cap filters run over the materialized index blocks — cheap, and
    // the filtered frames need no re-checkpoint
    val bandIdx = (0 until nBands).map { j =>
      if (cap <= 0) rawIdx(j)
      else rawIdx(j).filter(size(col(s"__cand_$j")) <= cap)
    }

    var out = streamHashed
    for (j <- 0 until nBands) {
      out = out
        .withColumn(s"__bv_$j",
          shiftright(col("__lh"), width * j).bitwiseAND(lit(mask)))
        .join(bandIdx(j), Seq(s"__bv_$j"), "left")
    }
    val candAll = array_distinct(concat((0 until nBands).map(j =>
      coalesce(col(s"__cand_$j"), array().cast("array<bigint>"))): _*))
    out
      .withColumn("right_id", explode(candAll))
      .join(corpusH, "right_id")
      .withColumn("hamming", expr("bit_count(__lh ^ __rh)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("left_id", "right_id", "hamming")
  }
}
