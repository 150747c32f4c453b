package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, PqIndex, Similarity}

/** Scale-stress probe for the ANN family (dev tooling, test scope):
  * replicates the sf0.1 embeddings corpus k = 1/4/16/64 times (2k ->
  * 128k vectors) with ids shifted and dimension 0 perturbed per copy
  * (no degenerate all-tie rankings), then times brute-force vs IVF
  * search over the SAME 10 queries. The claim under test is the scale
  * story IVF sells: brute grows linearly with the corpus while IVF
  * grows at ~nprobe/nlist of that slope, with the crossover visible
  * well before 100x. Run via `sbt "Test/runMain graft.ProbeScaleAnn"`.
  */
object ProbeScaleAnn {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    noop(spark.range(1000000).selectExpr("sum(id*2)")) // warm

    val e0 = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // crossJoin replication: one plan regardless of k (a k-arm union
    // blows the plan up past k~100), dimension 0 perturbed per copy
    def corpusTimes(k: Int): DataFrame =
      e0.crossJoin(broadcast(
          spark.range(k).select(col("id").cast("int").as("__c"))))
        .select((col("vec_id") + col("__c") * 10000000L).as("vec_id"),
          expr("transform(embedding, (x, i) ->" +
            " x + IF(i = 0, CAST(__c AS FLOAT) * 0.001f, 0f))")
            .as("embedding"))

    def time(name: String, runs: Int = 3)(f: => Long): Unit = {
      val rs = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = rs.map(_._1).sorted.apply(runs / 2)
      println(f"[scale] $name%-22s median $med%6.2f s  rows=${rs.head._2}%9d  (${rs.map(r => f"${r._1}%.2f").mkString(", ")})")
    }

    val queries = e0.filter(col("vec_id") < 10)
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(8, 64, 512)
    for (k <- ks) {
      val corpus = corpusTimes(k).localCheckpoint(eager = true)
      println(s"[scale] ---- k=$k  vectors=${corpus.count()} ----")
      time(s"brute  k=$k") {
        Similarity.bruteTopK(corpus, queries, "vec_id", "embedding", 5).count()
      }
      // index build is one corpus pass; amortized across every query
      // batch in a deployment, timed separately from search
      val index = IvfIndex.buildDeterministic(corpus, "vec_id", "embedding",
        nlist = 16)
      val cells = index.copy(cells = index.cells.localCheckpoint(eager = true))
      time(s"ivf np=4 k=$k") {
        IvfIndex.search(cells, queries, "vec_id", "embedding",
          k = 5, nprobe = 4).count()
      }
      time(s"lsh 8pl k=$k") {
        Similarity.lshTopK(corpus, queries, "vec_id", "embedding", 5, 8, 64)
          .count()
      }
      // PQ: encode once (the nightly compression pass, timed
      // separately), then ADC scans m ints per vector instead of 64
      // floats — the slope should sit between brute and IVF, with the
      // win growing as the corpus stops fitting raw vectors in memory
      val (cb, codes0) = PqIndex.buildDeterministic(corpus, "vec_id",
        "embedding", m = 8, ksub = 16)
      val codes = codes0.localCheckpoint(eager = true)
      time(s"pq adc k=$k") {
        PqIndex.searchAdc(cb, codes, queries, "vec_id", "embedding", 5)
          .count()
      }
      time(s"ivfpq np=4 k=$k") {
        PqIndex.searchIvfAdc(cells, cb, codes, queries, "vec_id",
          "embedding", k = 5, nprobe = 4).count()
      }
    }
    spark.stop()
  }
}
