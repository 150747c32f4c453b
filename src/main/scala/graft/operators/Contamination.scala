package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** C1: train/test contamination detection — for every eval-split
  * document, the fraction of its word-n-gram shingles that also occur
  * anywhere in the train split (the decontamination check run before
  * any benchmark number is trusted; n = 8..13 in published pipelines,
  * parameterized here).
  *
  * Scale shape: both sides reduce to (key = shingle hash) rows, the
  * train side is distinct-ed per shingle, and the overlap is one
  * hash-keyed join — work proportional to corpus shingle volume, never
  * |test| x |train|. At 100 TB the train shingle index is itself huge,
  * which is why this is a shuffle join on the hash (sort-merge
  * friendly), not a broadcast of the train set.
  */
object Contamination {

  /** Per-test-doc shingle overlap against the train split. `df` must
    * carry a split column (e.g. from [[Sampling.hashSplit]]);
    * `thrNum/thrDen` flag docs with overlap >= thrNum/thrDen using
    * integer arithmetic only.
    */
  def ngramOverlap(df: DataFrame, idCol: String, textCol: String,
      splitCol: String, n: Int, trainVal: String = "train",
      testVal: String = "test", thrNum: Long = 1, thrDen: Long = 5,
      tokenHash: Column => Column = Hashing.h30): DataFrame = {
    // only train/test docs are shingled — a 'val' split (or anything
    // else) must not pay the tokenize+hash+explode pass at corpus scale
    val relevant = df.filter(col(splitCol).isin(trainVal, testVal))
    val sets = Dedup.shingleSets(relevant, idCol, textCol, n, tokenHash)
      .join(relevant.select(col(idCol).as("doc_id"), col(splitCol).as("__split")),
        "doc_id")
    val trainSh = sets.filter(col("__split") === trainVal)
      .select("sh").distinct().withColumn("__hit", lit(1L))
    sets.filter(col("__split") === testVal)
      .join(trainSh, Seq("sh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      .select(col("doc_id"), col("n_shingles"), col("n_hit"),
        round(col("n_hit") / col("n_shingles"), 4).as("overlap_frac"),
        (col("n_hit") * thrDen >= col("n_shingles") * thrNum).as("contaminated"))
  }
}
