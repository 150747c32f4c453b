package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress probe for the entity-resolution fuzzy join (dev
  * tooling, test scope): k-replicated sf0.1 corpora (ids shifted,
  * tokens suffixed per copy — mutually dissimilar copies, same device
  * as ProbeScale) carved into the ER two-table shape: left = even ids,
  * right = every third id perturbed. Measures fuzzyJoin (capped) and
  * the bestMatch resolution on top. Run via
  * `sbt "Test/runMain graft.ProbeScaleEr"`.
  */
object ProbeScaleEr {
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
    import graft.operators.EntityResolution

    def time(name: String, runs: Int = 3)(f: => Long): Unit = {
      val rs = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = rs.map(_._1).sorted.apply(runs / 2)
      println(f"[scale-er] $name%-22s median $med%6.2f s  rows=${rs.head._2}%9d  (${rs.map(r => f"${r._1}%.2f").mkString(", ")})")
    }

    for (k <- Seq(1, 2, 4, 8)) {
      val corpus = corpusTimes(k)
      val left = corpus.filter(col("doc_id") % 2 === 0)
      val right = corpus.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 100000000L).as("doc_id"),
          concat(col("text"), lit(" zzev")).as("text"))
      println(s"[scale-er] ---- k=$k  left=${left.count()}  right=${right.count()} ----")
      time(s"fuzzyJoin k=$k") {
        EntityResolution.fuzzyJoin(left, right, "doc_id", "text",
          3, 2, 5, h30, maxDf = 100L).count()
      }
      time(s"bestMatch k=$k") {
        EntityResolution.bestMatch(
          EntityResolution.fuzzyJoin(left, right, "doc_id", "text",
            3, 2, 5, h30, maxDf = 100L)).count()
      }
    }
    spark.stop()
  }
}
