package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private val docs = (1L to 2000L).map(i => (i, s"lang${i % 4}"))
    .toDF("doc_id", "lang")

  test("hash split is deterministic, exhaustive, and near the target ratios") {
    val out = Sampling.hashSplit(docs, "doc_id", 80, 10)
    val counts = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000L)
    assert(math.abs(counts("train") - 1600L) < 100, s"train=${counts("train")}")
    assert(math.abs(counts("val") - 200L) < 60, s"val=${counts("val")}")
    assert(math.abs(counts("test") - 200L) < 60, s"test=${counts("test")}")
    // repartitioning must not move any row between splits (randomSplit
    // does not survive this)
    val again = Sampling.hashSplit(docs.repartition(7), "doc_id", 80, 10)
    assert(out.select("doc_id", "split").except(
      again.select("doc_id", "split")).isEmpty)
  }

  test("stratified sample keeps ~the same rate in every stratum") {
    val kept = Sampling.stratifiedSample(docs, "lang", "doc_id", 100)
    val rates = kept.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 500 docs per stratum at 10% -> ~50 each
    (0 until 4).foreach { i =>
      val n = rates.getOrElse(s"lang$i", 0L)
      assert(n > 20 && n < 90, s"lang$i kept $n of 500")
    }
    // growing the corpus never changes an existing row's fate
    val keptSmall = Sampling.stratifiedSample(
      docs.filter(col("doc_id") <= 1000), "lang", "doc_id", 100)
    assert(keptSmall.except(kept.filter(col("doc_id") <= 1000)).isEmpty)
  }

  test("rejects invalid percentages") {
    intercept[IllegalArgumentException](Sampling.hashSplit(docs, "doc_id", 80, 30))
    intercept[IllegalArgumentException](Sampling.stratifiedSample(docs, "lang", "doc_id", 1500))
  }

  test("mixSample hits target shares and caps oversubscribed sources") {
    // lang0..lang3 with 500 docs each; boost lang0 far beyond its size
    val kept = Sampling.mixSample(docs, "doc_id", "lang",
      Seq("lang0" -> 0.9), defaultShare = 0.1 / 3.0, totalFrac = 0.5)
    val counts = kept.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // lang0 threshold = min(1, 0.5*2000*0.9/500) = 1 -> keep all 500
    assert(counts("lang0") == 500L)
    // others: keep rate 0.5*2000*(0.1/3)/500 = 1/15 of 500 ~ 33
    (1 to 3).foreach { i =>
      val n = counts.getOrElse(s"lang$i", 0L)
      assert(n > 10 && n < 60, s"lang$i kept $n")
    }
    // deterministic under repartitioning
    val again = Sampling.mixSample(docs.repartition(7), "doc_id", "lang",
      Seq("lang0" -> 0.9), defaultShare = 0.1 / 3.0, totalFrac = 0.5)
    assert(kept.except(again).isEmpty && again.except(kept).isEmpty)
  }

  test("null strata and sources are sampled, not silently dropped") {
    val withNulls = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (1L to 600L).map(i => org.apache.spark.sql.Row(
          i, if (i % 3 == 0) null else s"lang${i % 2}"))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("lang",
          org.apache.spark.sql.types.StringType))))
    // stratified: null stratum keeps ~half at 500 permille
    val kept = Sampling.stratifiedSample(withNulls, "lang", "doc_id", 500)
      .filter(col("lang").isNull).count()
    assert(kept > 50 && kept < 150, s"null stratum kept $kept of 200")
    // mix: null source sampled at defaultShare, not dropped by the join
    val mixed = Sampling.mixSample(withNulls, "doc_id", "lang",
      Seq("lang0" -> 0.4), defaultShare = 0.3, totalFrac = 0.5)
    assert(mixed.filter(col("lang").isNull).count() > 0)
    assert(mixed.count() < 600)
  }

  test("deterministic shuffle is an exact permutation, layout-stable, salt-sensitive") {
    import spark.implicits._
    val docs = (1L to 777L).toDF("doc_id")
    val ranks = Sampling.deterministicShuffle(docs, "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shuffle_rank"))
      .toMap
    // exact permutation: every rank 0..n-1 exactly once
    assert(ranks.values.toSeq.sorted == (0L until 777L))
    // not the identity order (it's a shuffle)
    assert((1L to 777L).map(ranks) != (0L until 777L))
    // identical under a different partition layout
    val again = Sampling.deterministicShuffle(docs.repartition(13), "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shuffle_rank"))
      .toMap
    assert(again == ranks)
    // a new salt is a fresh epoch permutation
    val epoch2 = Sampling.deterministicShuffle(docs, "doc_id", salt = "epoch2")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shuffle_rank"))
      .toMap
    assert(epoch2 != ranks && epoch2.values.toSeq.sorted == (0L until 777L))
  }
}
