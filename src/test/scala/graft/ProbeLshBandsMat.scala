package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Materializer}

/** Adjudicates a surprise from the r14 AutoBucket arms of
  * [[ProbeScaleLshSkew]]: the auto path — which checkpoints the BAND
  * rows before the self-join — read consistently FASTER than the
  * plain uncapped path at 400k/800k (8.9 vs 7.2 / 15.3 vs 27.4 s on a
  * noisy box), contradicting the bandHashes scaladoc's recorded
  * "checkpointing the bands measured no further win". The structural
  * reason it COULD win: the uncapped path feeds the un-materialized
  * band frame to BOTH sides of the candidate self-join, so the
  * signature aggregation (one groupBy over the shingle index
  * computing all k mins) runs TWICE; checkpointing the bands halves
  * that at the cost of writing ~n x nBands rows to local store.
  *
  * Method: the [[Dedup.minhashLsh]] chain rebuilt from its public
  * pieces with the band frame either plain or checkpointed — the ONLY
  * difference between arms — timed INTERLEAVED (plain, mat, plain,
  * mat, ...) so box drift hits both arms equally, 5 reps each, fresh
  * corpus per rep, full unpersist sweep between reps (the
  * ProbeScaleLshSkew hygiene). Uniform corpus (the skew question is
  * settled; this is a pure materialization A/B).
  * Run: sbt -batch "Test/runMain graft.ProbeLshBandsMat"
  */
object ProbeLshBandsMat {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def corpus(n: Long) = spark.range(n)
      .withColumn("__b",
        expr("CASE WHEN id % 1000 = 1 THEN id - 1 ELSE id END"))
      .select(col("id").as("doc_id"), expr(
        """concat_ws(' ',
          |  concat_ws(' ', transform(sequence(1, 50), j -> concat('u', __b, '_', j))),
          |  CASE WHEN id % 1000 = 1 THEN 'zz' ELSE concat('t', __b) END)"""
          .stripMargin).as("text"))

    def sweep(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }

    // the minhashLsh chain from its public pieces; matBands is the arm
    def pairs(df: DataFrame, matBands: Boolean): Long = {
      val mat = Materializer.of(spark)
      val sets = mat(Dedup.shingleSets(df, "doc_id", "text", 3))
      val bands0 = Dedup.bandHashes(Dedup.minhashSignatures(sets))
      val bands = if (matBands) mat(bands0) else bands0
      val cand = bands.as("x")
        .join(bands.as("y"), Seq("band", "bh"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      Dedup.jaccardFilter(Dedup.exactShared(cand, sets), sets, 8, 10)
        .filter(col("doc_b") === col("doc_a") + 1 && col("doc_b") % 1000 === 1)
        .count()
    }

    for (n <- Seq(400000L, 800000L)) {
      val planted = n / 1000
      val results = (1 to 5).flatMap { _ =>
        Seq(false, true).map { m =>
          val df = corpus(n)
          val t0 = System.nanoTime()
          val got = pairs(df, m)
          val dt = (System.nanoTime() - t0) / 1e9
          sweep()
          assert(got >= (planted * 99) / 100,
            s"n=$n mat=$m: planted $got/$planted below 99%")
          (m, dt)
        }
      }
      for (m <- Seq(false, true)) {
        val ts = results.filter(_._1 == m).map(_._2).sorted
        val arm = if (m) "matBands  " else "plainBands"
        println(f"[probe] $arm n=$n median ${ts(ts.size / 2)}%6.2f s " +
          f"(${ts.map(t => f"$t%.2f").mkString(", ")})")
      }
    }
    spark.stop()
  }
}
