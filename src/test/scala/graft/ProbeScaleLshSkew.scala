package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** VERDICT_r13 #6a: the D3 MinHash-LSH band join at growing corpus
  * under a SKEWED shingle distribution. The claim under test: band
  * buckets stay narrow because signatures mix the whole shingle set —
  * but a popular contiguous stop-phrase block breaks that: a perm's
  * minimum over the block's shingles is the SAME shingle (hence the
  * same hash) for every doc carrying the block, so every doc whose
  * 4 coords of some band are all block-dominated lands in ONE bucket.
  * Bucket width then grows linearly with the corpus and the band
  * join's pair volume QUADRATICALLY — the exact failure shape
  * simhashBandPairs already guards with maxBucket and the LSH join
  * did not (until this probe motivated the [[graft.operators.Dedup
  * .minhashLsh]] maxBucket knob).
  *
  * Corpus: docs of 50 unique tokens; 50% carry a shared 50-token stop
  * block (the skew); 1/1000 docs is a planted near-dup of its
  * neighbor (identical but the last token — 3-gram Jaccard ~0.95,
  * S-curve hit probability 1-(1-0.95^4)^4 = 0.9988), so recall is
  * ASSERTED on known pairs, not just speed. Arms: skewed vs uniform
  * (stop block off), then the capped join (maxBucket=200) on the
  * skewed corpus — the cap must restore the uniform slope WITHOUT
  * losing planted pairs (a planted pair matches in all 4 bands;
  * dropping the one hot bucket leaves 3).
  *
  * Hygiene: every rep regenerates its corpus and then unpersists ALL
  * cached blocks + System.gc() — each minhashLsh call materializes an
  * O(n x shingles) index (localCheckpoint), and without the sweep the
  * blocks of earlier reps pile into the fixed heap and later arms
  * measure GC thrash, not the band join (the first cut of this probe
  * did exactly that: arm order, not skew, dominated the 800k tier).
  *
  * r14: a fourth arm runs `maxBucket = AutoBucket` on BOTH corpora —
  * the decision must stay uncapped on the uniform corpus (hottest
  * bucket << threshold), engage on the skewed one past the threshold,
  * and cost no more than one map-side-combinable count over the band
  * rows on top of whichever arm it picks. Also r14: `--big` runs the
  * 2M/4M tiers with the skewed-uncapped arm at ONE rep past 2M (its
  * quadratic term is the regime being escaped; 3 reps of a known
  * catastrophe teach nothing) while capped/auto keep 3. The big tiers
  * run at 128 shuffle partitions: per SCALING.md's own sizing rule
  * partitions scale with data, and holding the sf0.1 constant (32) at
  * 4M docs put per-task join/agg state past a 48g JVM's execution
  * memory (UNABLE_TO_ACQUIRE_MEMORY in the verify agg) — the probe
  * measures the operator, not an undersized-partition config.
  * Run: sbt -batch "Test/runMain graft.ProbeScaleLshSkew [--big]"
  */
object ProbeScaleLshSkew {
  def main(args: Array[String]): Unit = {
    val bigMode = args.contains("--big")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", if (bigMode) "128" else "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stop = (1 to 50).map(i => s"s$i").mkString(" ")
    def corpus(n: Long, skewed: Boolean) = {
      val block =
        if (skewed) s"CASE WHEN __b % 10 < 5 THEN '$stop' ELSE '' END"
        else "''"
      spark.range(n)
        .withColumn("__b",
          expr("CASE WHEN id % 1000 = 1 THEN id - 1 ELSE id END"))
        .select(col("id").as("doc_id"), expr(
          s"""concat_ws(' ',
             |  concat_ws(' ', transform(sequence(1, 50), j -> concat('u', __b, '_', j))),
             |  $block,
             |  CASE WHEN id % 1000 = 1 THEN 'zz' ELSE concat('t', __b) END)"""
            .stripMargin).as("text"))
    }

    def sweep(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }

    def run(name: String, n: Long, skewed: Boolean, maxBucket: Long,
        reps: Int = 3): Unit = {
      val planted = n / 1000
      val rs = (1 to reps).map { _ =>
        val df = corpus(n, skewed)
        val t0 = System.nanoTime()
        val got = graft.operators.Dedup
          .minhashLsh(df, "doc_id", "text", 3, 8, 10, maxBucket = maxBucket)
          .filter(col("doc_b") === col("doc_a") + 1 &&
            col("doc_b") % 1000 === 1)
          .count()
        val dt = (System.nanoTime() - t0) / 1e9
        sweep()
        (dt, got)
      }
      val got = rs.head._2
      assert(got >= (planted * 99) / 100,
        s"$name: planted recall ${got}/$planted below 99%")
      val med = rs.map(_._1).sorted.apply(rs.size / 2)
      println(f"[probe] $name median $med%6.2f s " +
        f"(${rs.map(t => f"${t._1}%.2f").mkString(", ")}) planted=$got/$planted")
    }

    val big = bigMode
    val auto = graft.operators.Dedup.AutoBucket
    if (!big) {
      for (n <- Seq(100000L, 200000L, 400000L, 800000L)) {
        run(s"uniform   n=$n", n, skewed = false, 0L)
        run(s"skewed    n=$n", n, skewed = true, 0L)
        run(s"capped200 n=$n", n, skewed = true, 200L)
        run(s"autoUnif  n=$n", n, skewed = false, auto)
        run(s"autoSkew  n=$n", n, skewed = true, auto)
      }
    } else {
      for (n <- Seq(2000000L, 4000000L)) {
        run(s"uniform   n=$n", n, skewed = false, 0L)
        run(s"skewed    n=$n", n, skewed = true, 0L, reps = 1)
        run(s"capped200 n=$n", n, skewed = true, 200L)
        run(s"autoSkew  n=$n", n, skewed = true, auto)
      }
    }
    spark.stop()
  }
}
