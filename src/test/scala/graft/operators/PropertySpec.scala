package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSuite

/** Property-based checks for the deterministic kernels whose contracts
  * are algebraic (order statistics, permutations, idempotence) — the
  * places where an example-based spec can miss a boundary the
  * generator finds (duplicates, ties, degenerate sizes, odd unicode).
  */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private def check(p: Prop, n: Int): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(r.passed, r.status.toString)
  }

  test("rankSelect returns the exact order statistic, duplicates and all") {
    val gen = for {
      vals <- Gen.nonEmptyListOf(Gen.chooseNum(-50L, 50L)) // dense -> many ties
      num <- Gen.chooseNum(1L, 100L)
    } yield (vals, num)
    check(Prop.forAll(gen) { case (vals, num) =>
      val den = 100L
      val df = vals.map(v => ("k", v)).toDF("key", "v")
      val row = Baseline.rankSelect(df, "key", "v", num, den).head
      val sorted = vals.sorted
      val n = vals.length
      val idx = sorted.indices.find(i => (i + 1) * den >= num * n).get
      row.getAs[Long]("sel") == sorted(idx) && row.getAs[Long]("n") == n.toLong
    }, 15)
  }

  test("normalize is idempotent on arbitrary text") {
    val charGen = Gen.frequency(
      (6, Gen.alphaNumChar),
      (2, Gen.oneOf(' ', '\t', '\n', ' ')),
      (1, Gen.oneOf('', '', '')),
      (1, Gen.oneOf('—', '–', 'É', 'ß', '中')))
    val docGen = Gen.listOf(charGen).map(_.mkString)
    check(Prop.forAll(Gen.listOfN(40, docGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
        .select(col("id"), TextAnalysis.normalize(col("text")).as("n1"))
        .select(col("id"), col("n1"),
          TextAnalysis.normalize(col("n1")).as("n2"))
      df.collect().forall(r => r.getString(1) == r.getString(2))
    }, 5)
  }

  test("deterministicShuffle is a 0..n-1 permutation for arbitrary id sets") {
    val idsGen = Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2))
      .map(_.distinct)
    check(Prop.forAll(idsGen) { ids =>
      val ranks = Sampling.deterministicShuffle(ids.toDF("doc_id"), "doc_id")
        .collect().map(_.getAs[Long]("shuffle_rank")).sorted
      ranks.toSeq == (0L until ids.length.toLong)
    }, 10)
  }

  test("bucketOf lands in [0, buckets) for arbitrary keys and salts") {
    val gen = for {
      keys <- Gen.nonEmptyListOf(Gen.alphaNumStr)
      salt <- Gen.identifier
      buckets <- Gen.chooseNum(1, 1000)
    } yield (keys, salt, buckets)
    check(Prop.forAll(gen) { case (keys, salt, buckets) =>
      val out = keys.toDF("k")
        .select(Sampling.bucketOf(col("k"), salt, buckets).as("b"))
        .collect().map(_.getAs[Long]("b"))
      out.forall(b => b >= 0 && b < buckets)
    }, 10)
  }
}
