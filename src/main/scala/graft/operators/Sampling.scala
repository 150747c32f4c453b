package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Deterministic dataset splitting and sampling (SURVEY.md §2.3) —
  * the assignment operators every training pipeline runs before and
  * after curation. Both are pure row-local hash projections: no
  * shuffle, no RNG state, stable under re-runs, retries, and
  * repartitioning (Spark's randomSplit is none of those — sampling
  * with a seed still depends on partition layout), and reproducible
  * by any engine that can compute md5.
  */
object Sampling {

  /** Hash bucket in [0, buckets): md5-derived, salted so independent
    * splits/samples decorrelate.
    */
  def bucketOf(c: Column, salt: String, buckets: Int): Column =
    Hashing.md5Long60(concat(lit(salt), lit("_"), c.cast("string"))) % buckets

  def bucketOfSql(e: String, salt: String, buckets: Int): String =
    s"(${Hashing.md5Long60Sql(s"'${salt}_' || CAST(($e) AS VARCHAR)")} % $buckets)"

  /** Assign `train` / `val` / `test` by hash percentile of the id —
    * percentages out of 100; the remainder is test.
    */
  def hashSplit(df: DataFrame, idCol: String, trainPct: Int, valPct: Int,
      salt: String = "split"): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split: train=$trainPct val=$valPct")
    val b = bucketOf(col(idCol), salt, 100)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Keep a deterministic ~`permille`/1000 of each stratum: rows are
    * kept where the (stratum, id) hash falls under the threshold, so
    * every stratum is sampled at the same rate regardless of size —
    * and the kept set is stable as the corpus grows (a row's fate
    * never depends on other rows).
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      permille: Int, salt: String = "sample"): DataFrame = {
    require(permille >= 0 && permille <= 1000, s"invalid permille=$permille")
    val key = concat(col(stratumCol).cast("string"), lit("|"),
      col(idCol).cast("string"))
    df.filter(bucketOf(key, salt, 1000) < permille)
  }
}
