package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class TemperatureMixSpec extends SparkSuite {
  import spark.implicits._

  private def corpus(sizes: Map[String, Int]) =
    sizes.toSeq.flatMap { case (src, n) =>
      (0 until n).map(i => (s"$src-$i".hashCode.toLong & 0xffffffL, src))
    }.toDF("doc_id", "source")

  test("temperature flattens the mix: small sources keep a higher fraction") {
    val df = corpus(Map("big" -> 6400, "small" -> 100))
    val kept = Sampling.temperatureMix(df, "doc_id", "source", 0.25)
      .groupBy("source").agg(count(lit(1)).as("k"))
      .as[(String, Long)].collect().toMap
    val keptFracBig = kept.getOrElse("big", 0L).toDouble / 6400
    val keptFracSmall = kept.getOrElse("small", 0L).toDouble / 100
    // sqrt weighting: small's keep-rate must exceed big's by ~sqrt(64)=8x
    assert(keptFracSmall > 4 * keptFracBig)
    // and the total stays in the neighborhood of totalFrac
    val total = kept.values.sum.toDouble / 6500
    assert(total > 0.15 && total < 0.40)
  }

  test("profile thresholds are exact and cap at keep-all") {
    // tiny source whose share asks for more rows than it has -> thr capped
    val df = corpus(Map("huge" -> 5000, "tiny" -> 4))
    val prof = Sampling.temperatureMixProfile(df, "source", 0.5)
      .as[(String, Long)].collect().toMap
    assert(prof("tiny") == 1000000L) // keep-all
    assert(prof("huge") < 1000000L)
  }

  test("deterministic: same input -> identical kept set; independent of partitioning") {
    val df = corpus(Map("a" -> 300, "b" -> 900))
    def ids(d: org.apache.spark.sql.DataFrame) =
      Sampling.temperatureMix(d, "doc_id", "source", 0.3)
        .select("doc_id").as[Long].collect().toSet
    val base = ids(df)
    assert(base.nonEmpty)
    assert(ids(df.repartition(7)) == base)
    assert(ids(df.orderBy(desc("doc_id"))) == base)
  }

  test("null source samples as its own stratum instead of dropping") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, null), (4L, null))
      .toDF("doc_id", "source")
    // totalFrac 1.0 -> every stratum keeps everything
    val kept = Sampling.temperatureMix(df, "doc_id", "source", 1.0).count()
    assert(kept == 4L)
  }
}
