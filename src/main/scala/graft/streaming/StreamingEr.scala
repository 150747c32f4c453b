package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.operators.Dedup

/** ER3: streaming entity resolution — a live stream of entities
  * fuzzy-matched against a STATIC reference table, with EXACT Jaccard
  * verification at ingest and ZERO streaming state.
  *
  * Where [[StreamingIncremental]] stops at a `near_candidate` flag
  * (verification deferred to the batch pass), this operator emits the
  * VERIFIED scored pair: the stream row carries its full distinct-gram
  * array in-row, candidates arrive as ARRAYS from a static
  * band -> right-ids index (array union = stateless dedup of
  * multi-band hits — a streaming `distinct` would need state), and
  * `shared` is computed per candidate with `array_intersect` against
  * the reference side's materialized gram array — row-local, exact,
  * the same integer threshold arithmetic as
  * [[graft.operators.EntityResolution.fuzzyJoin]].
  *
  * Candidate recall is the MinHash-band trade (the D3/D8 contract, not
  * ER1's complete shingle index): pairs sharing no band are missed —
  * at Jaccard >= 1/2 with 4 bands of 4 rows that probability is
  * negligible, and the spec pins pair-for-pair parity with the batch
  * band-candidate computation, so the two sides of a deployment can
  * never drift.
  *
  * Scale shape: stream side is pure row-local projection + K static
  * broadcast-joinable lookups (hot band buckets bound candidate-array
  * width — cap corpus-side via maxBucket if a boilerplate band
  * explodes); append mode, unbounded-history safe.
  */
object StreamingEr {

  private val NBands = Dedup.MinhashK / Dedup.BandRows

  /** In-row distinct gram-hash array (empty under `n` tokens). */
  private def gramArray(text: Column, n: Int,
      tokenHash: Column => Column): Column = {
    val th = transform(Dedup.tokens(text), t => tokenHash(t))
    val grams = transform(sequence(lit(0), size(th) - n),
      i => (0 until n).map(k =>
        lit(Dedup.ShingleCoef(k)) * element_at(th, i + k + 1)).reduce(_ + _))
    when(size(th) >= n, array_distinct(grams))
      .otherwise(array().cast("array<bigint>"))
  }

  /** Match a stream of (`idCol`, `textCol`) entities against the
    * static `reference` table: one APPEND row per verified pair —
    * (left_id, right_id, shared, n_l, n_r, jaccard) with Jaccard >=
    * num/den, exactly [[graft.operators.EntityResolution.fuzzyJoin]]'s
    * output columns.
    */
  def matchAgainst(stream: DataFrame, reference: DataFrame,
      idCol: String, textCol: String, n: Int, num: Long, den: Long,
      tokenHash: Column => Column = Hashing.h30): DataFrame = {
    val ref = reference.select(col(idCol).as("right_id"),
      col(textCol).as("text"))
    val refSets = Dedup.shingleSets(ref, "right_id", "text", n, tokenHash)
    // reference-side indexes, built once at query start:
    // right_id -> (gram array, size) for in-row verification
    val refGrams = refSets.groupBy(col("doc_id").as("right_id"))
      .agg(collect_list(col("sh")).as("__rgrams"),
        count(lit(1)).as("n_r"))
    // per band: bh -> candidate right-id array (collect_set dedups)
    val bands = Dedup.bandHashes(Dedup.minhashSignatures(
      refSets.select(col("doc_id"), col("sh"))))
    val bucketIdx = (0 until NBands).map { j =>
      bands.filter(col("band") === j)
        .groupBy(col("bh").as(s"__bh_$j"))
        .agg(collect_set(col("doc_id")).as(s"__cand_$j"))
    }

    var out = stream
      .select(col(idCol).as("left_id"), col(textCol).as("text"))
      .withColumn("__lg", gramArray(col("text"), n, tokenHash))
    for (i <- 0 until Dedup.MinhashK) {
      val (a, b) = Dedup.minhashPerms(i)
      out = out.withColumn(s"__mh_$i", array_min(transform(col("__lg"),
        s => ((s % 1073741824L) * a + b) % Dedup.MinhashP)))
    }
    for (j <- 0 until NBands) {
      val parts = (0 until Dedup.BandRows)
        .map(k => col(s"__mh_${Dedup.BandRows * j + k}"))
      out = out.withColumn(s"__bh_$j", md5(concat_ws("_", parts: _*)))
        .join(bucketIdx(j), Seq(s"__bh_$j"), "left")
    }
    // union of per-band hits = the candidate set, deduped in-row
    val candAll = array_distinct(concat((0 until NBands).map(j =>
      coalesce(col(s"__cand_$j"), array().cast("array<bigint>"))): _*))
    out
      .withColumn("right_id", explode(candAll))
      .join(refGrams, "right_id")
      .withColumn("shared",
        size(array_intersect(col("__lg"), col("__rgrams"))).cast("long"))
      .withColumn("n_l", size(col("__lg")).cast("long"))
      .filter(lit(den + num) * col("shared") >= lit(num) * (col("n_l") + col("n_r")))
      .withColumn("jaccard",
        round(col("shared") / (col("n_l") + col("n_r") - col("shared")), 4))
      .select("left_id", "right_id", "shared", "n_l", "n_r", "jaccard")
  }
}
