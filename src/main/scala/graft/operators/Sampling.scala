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

  /** P5: source mixing — downsample each source toward a target mix.
    * `shares(source)` is the share of the output each source should
    * contribute (missing sources get `defaultShare`), `totalFrac` the
    * output size as a fraction of the corpus. Per-source keep
    * threshold: min(1, totalFrac * N * share / n_source), applied as a
    * deterministic id-hash cut — so the kept set is reproducible,
    * retry-stable, and stable under repartitioning. Oversubscribed
    * sources (share asking for more rows than exist) cap at keep-all
    * rather than upsampling.
    *
    * Scale shape: the per-source counts are one partial-aggregated
    * groupBy producing a sources-sized table that broadcast-joins back
    * onto the corpus — no shuffle of the data rows at all.
    */
  def mixSample(df: DataFrame, idCol: String, sourceCol: String,
      shares: Seq[(String, Double)], defaultShare: Double,
      totalFrac: Double, salt: String = "mix"): DataFrame = {
    val shareExpr = shares.foldLeft(lit(defaultShare)) { case (acc, (s, w)) =>
      when(col(sourceCol) === s, lit(w)).otherwise(acc)
    }
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
    val total = df.select(count(lit(1)).as("__total"))
    df.join(broadcast(counts), sourceCol)
      .crossJoin(broadcast(total))
      .withColumn("__thr", least(lit(1000000L),
        floor(lit(1e6) * lit(totalFrac) * col("__total") * shareExpr / col("__n"))
          .cast("long")))
      .filter(bucketOf(col(idCol), salt, 1000000) < col("__thr"))
      .drop("__n", "__total", "__thr")
  }
}
