package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** VERDICT_r13 #6b: C9 scrubSemantic's nprobe recall boundary AT the
  * tau decision threshold. The operator's routing claim: a train
  * vector reaches an eval partner only if one of its `nprobe` nearest
  * eval-cells contains that partner — misses are CELL-ROUTING misses,
  * and they concentrate among pairs whose cosine sits just above tau
  * (a heavily-perturbed copy drifts toward a cell boundary exactly as
  * its cosine decays toward the threshold). This probe plants
  * near-copies with a RANGE of perturbation strengths straddling tau,
  * derives ground truth by brute force over the PLANTED subset only
  * (plants x eval is probe-sized; the operator never sees the truth
  * arm), and reports recall per true-cosine bucket per nprobe.
  *
  * Asserted, not just reported: (1) zero false positives — a flagged
  * plant must truly have max cosine >= tau (the cosine arithmetic is
  * exact; only RECALL is probabilistic); (2) recall is monotone in
  * nprobe overall; (3) the exact-copy bucket (cos = 1.0 — routing
  * cannot miss: identical vector, identical nearest cell) is
  * recalled at 100% at EVERY nprobe.
  * Run: sbt -batch "Test/runMain graft.ProbeSemBoundary"
  */
object ProbeSemBoundary {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{SemDedup, Similarity}

    val dim = 64
    val tau = 0.95
    def gen(base: String) = expr(
      s"transform(sequence(1, $dim), j -> CAST((abs(xxhash64(concat($base, '_', j))) % 2000 - 1000) AS DOUBLE) / 1000.0)")
    val eval = spark.range(2000).select(col("id").as("vec_id"),
      gen("id").as("embedding")).localCheckpoint(eager = true)

    // train: every 50th id is a plant — a copy of eval (id % 2000)
    // perturbed by delta * h(id), delta stepping 0.0 (exact copy)
    // to 0.40 by plant index, so true cosines spread ~[0.92, 1.0]
    // straddling tau; the rest is random background (dim-64 random
    // cosines are ~N(0, 1/64): an accidental 0.95 is ~7.6 sigma,
    // so background never contaminates)
    val n = 200000L
    val train = spark.range(n)
      .withColumn("__p", col("id") % 50 === 0)
      .withColumn("__src", col("id") % 2000)
      .withColumn("__d", expr("CAST((id div 50) % 9 AS DOUBLE) * 0.05"))
      .select(col("id").as("vec_id"), col("__p"), col("__src"),
        when(col("__p"),
          expr(s"""zip_with(
            transform(sequence(1, $dim), j -> CAST((abs(xxhash64(concat(__src, '_', j))) % 2000 - 1000) AS DOUBLE) / 1000.0),
            transform(sequence(1, $dim), j -> CAST((abs(xxhash64(concat('h', id, '_', j))) % 2000 - 1000) AS DOUBLE) / 1000.0),
            (a, b) -> a + __d * b)"""))
          .otherwise(gen("(1000000 + id)")).as("embedding"))
      .localCheckpoint(eager = true)

    // ground truth over the planted subset only: brute max cosine to
    // the whole eval set (plants x eval = 4k x 2k — probe-sized)
    val pn = Similarity.withNorm(train.filter(col("__p")), "vec_id", "embedding")
    val en = Similarity.withNorm(eval, "vec_id", "embedding")
      .select(col("vec_id").as("eid"), col("v").as("ev"), col("nrm2").as("en2"))
    val truth = pn.crossJoin(broadcast(en))
      .select(col("vec_id"),
        Similarity.cosine(Similarity.dotD(col("v"), col("ev")),
          col("nrm2"), col("en2")).as("cos"))
      .groupBy("vec_id").agg(max(col("cos")).as("true_cos"))
      .localCheckpoint(eager = true)

    val overall = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (np <- Seq(1, 2, 4)) {
      val verdicts = SemDedup.scrubSemantic(train, eval, "vec_id",
        "embedding", nlist = 64, tau = tau, nprobe = np)
      val joined = truth.join(verdicts, Seq("vec_id"))
        .select(col("vec_id"), col("true_cos"),
          (col("status") === "contaminated").as("hit"))
        .localCheckpoint(eager = true)
      // (1) exactness: a hit means true cosine really reaches tau
      val fp = joined.filter(col("hit") && col("true_cos") < tau).count()
      assert(fp == 0, s"nprobe=$np: $fp false positives")
      // (3) exact copies can never be routing misses
      val exactMiss = joined
        .filter(col("true_cos") >= 0.9999999 && !col("hit")).count()
      assert(exactMiss == 0, s"nprobe=$np: $exactMiss exact-copy misses")
      val buckets = joined.filter(col("true_cos") >= tau)
        .withColumn("bucket",
          when(col("true_cos") >= 0.9999999, "1.00 (exact)")
            .when(col("true_cos") >= 0.99, "[0.99, 1.00)")
            .when(col("true_cos") >= 0.97, "[0.97, 0.99)")
            .otherwise(f"[$tau%.2f, 0.97)"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_true"),
          sum(when(col("hit"), 1L).otherwise(0L)).as("n_hit"))
        .orderBy("bucket")
        .collect()
      val (tTot, hTot) = buckets.foldLeft((0L, 0L)) { case ((a, b), r) =>
        (a + r.getLong(1), b + r.getLong(2)) }
      println(f"[probe] nprobe=$np overall recall ${hTot.toDouble / tTot}%.4f ($hTot/$tTot)")
      buckets.foreach { r =>
        println(f"[probe]   ${r.getString(0)}%-14s n_true=${r.getLong(1)}%5d recall=${r.getLong(2).toDouble / r.getLong(1)}%.4f")
      }
      overall += hTot.toDouble / tTot
    }
    // (2) more probes never lose recall
    assert(overall.sliding(2).forall(w => w(0) <= w(1) + 1e-12),
      s"recall not monotone in nprobe: ${overall.mkString(", ")}")
    spark.stop()
  }
}
