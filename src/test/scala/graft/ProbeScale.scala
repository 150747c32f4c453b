package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress probe for the dedup family (dev tooling, test scope):
  * replicates the sf0.1 documents corpus k = 1/2/4/8 times with ids
  * shifted AND every token suffixed by the copy index, so copies are
  * mutually dissimilar — k independent instances of the same corpus
  * structure. Output volume then scales ~linearly in k and the
  * time-vs-rows curvature isolates PLAN behavior (bucket shuffles,
  * index materialization) from inherent output growth. Run via
  * `sbt "Test/runMain graft.ProbeScale"`.
  */
object ProbeScale {
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

    val d0 = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def corpusTimes(k: Int): DataFrame =
      (0 until k).map { c =>
        d0.select((col("doc_id") + c * 10000000L).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"$$1$c").as("text"))
      }.reduce(_ union _)

    val h30 = graft.functions.Hashing.h30 _
    import graft.operators.Dedup

    def time(name: String, runs: Int = 3)(f: => Long): Unit = {
      val rs = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = rs.map(_._1).sorted.apply(runs / 2)
      println(f"[scale] $name%-22s median $med%6.2f s  rows=${rs.head._2}%9d  (${rs.map(r => f"${r._1}%.2f").mkString(", ")})")
    }

    for (k <- Seq(1, 2, 4, 8)) {
      val corpus = corpusTimes(k)
      val nDocs = corpus.count()
      println(s"[scale] ---- k=$k  docs=$nDocs ----")
      time(s"ngram  k=$k") {
        Dedup.ngramJaccard(corpus, "doc_id", "text", 3, 1, 2, h30,
          maxDf = 100L).count()
      }
      time(s"minhash k=$k") {
        Dedup.minhashLsh(corpus, "doc_id", "text", 3, 1, 2, h30).count()
      }
      time(s"clusters k=$k") {
        val pairs = Dedup.minhashLsh(corpus, "doc_id", "text", 3, 1, 2, h30)
          .select("doc_a", "doc_b")
        Dedup.clusters(corpus, "doc_id", pairs).count()
      }
    }
    spark.stop()
  }
}
