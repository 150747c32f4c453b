package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Materializer}

/** Interleaved A/B for the r14 df-cap rework (the same adjudication
  * ProbeLshBandsMat gave the band-materialization question): the
  * r12-r14 capped n-gram path split rare/hot postings by annotating
  * every index row with its shingle df via a count window — one
  * shuffle + sort of the whole inverted index under the checkpoint —
  * while the shipped form aggregates the tiny hot-shingle table and
  * splits with broadcast semi/anti joins. The same-session bench
  * pairing showed the new form +25% at sf0.1 (extra eager agg + join
  * stages on a few-MB index); the claim to verify is that the trade
  * inverts at corpus scale, where the deleted Exchange+Sort is
  * corpus-sized.
  *
  * Both forms are built HERE from the same public pieces (the window
  * form reconstructed faithfully from the pre-rework source), run
  * over a pre-materialized shingle index so the arms differ ONLY in
  * the split, interleaved (window, hot, window, hot, ...) with fresh
  * corpus + unpersist sweep per rep so box drift hits both arms
  * equally. Corpus: 50-token docs, 50% carrying a 30-token stop block
  * (so hot postings EXIST: block shingles reach df ~ n/2), planted
  * neighbor dups asserted per rep.
  * Run: sbt -batch "Test/runMain graft.ProbeDfCapForm"
  */
object ProbeDfCapForm {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stop = (1 to 30).map(i => s"s$i").mkString(" ")
    def corpus(n: Long) = spark.range(n)
      .withColumn("__b",
        expr("CASE WHEN id % 1000 = 1 THEN id - 1 ELSE id END"))
      .select(col("id").as("doc_id"), expr(
        s"""concat_ws(' ',
           |  concat_ws(' ', transform(sequence(1, 50), j -> concat('u', __b, '_', j))),
           |  CASE WHEN __b % 2 = 0 THEN '$stop' ELSE '' END,
           |  CASE WHEN id % 1000 = 1 THEN 'zz' ELSE concat('t', __b) END)"""
          .stripMargin).as("text"))

    def sweep(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }

    val maxDf = 64L

    // the pre-rework split: df annotation via count window, filter
    def windowSplit(idx: DataFrame): (DataFrame, DataFrame) = {
      val withDf = idx.withColumn("__df",
        count(lit(1)).over(Window.partitionBy(col("sh"))))
      (withDf.filter(col("__df") <= maxDf).drop("__df"),
        withDf.filter(col("__df") > maxDf).drop("__df"))
    }
    // the shipped split: aggregated hot table + semi/anti joins
    def hotTableSplit(idx: DataFrame): (DataFrame, DataFrame) = {
      val hotSh = Materializer.of(spark)(
        idx.groupBy(col("sh")).agg(count(lit(1)).as("__df"))
          .filter(col("__df") > maxDf)
          .select(col("sh")))
      (idx.join(hotSh, Seq("sh"), "left_anti"),
        idx.join(hotSh, Seq("sh"), "left_semi"))
    }

    // the full capped pair pipeline over a given split (the
    // cappedJaccardPairs tail, shared verbatim by both arms)
    def pairs(df: DataFrame, hotForm: Boolean): Long = {
      val idx = Materializer.of(spark)(
        Dedup.shingleSets(df, "doc_id", "text", 3))
      val (rare, hot) = if (hotForm) hotTableSplit(idx) else windowSplit(idx)
      val rareShared = Dedup.sharedCounts(rare)
      val hotShared = rareShared.select("doc_a", "doc_b")
        .join(hot.select(col("doc_id").as("doc_a"), col("sh")), "doc_a")
        .join(hot.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("__hot"))
      val shared = rareShared.join(hotShared, Seq("doc_a", "doc_b"), "left")
        .select(col("doc_a"), col("doc_b"),
          (col("shared") + coalesce(col("__hot"), lit(0L))).as("shared"))
      Dedup.jaccardFilterSizes(shared,
        idx.groupBy(col("doc_id")).agg(count(lit(1)).as("n")), 8, 10)
        .filter(col("doc_b") === col("doc_a") + 1 && col("doc_b") % 1000 === 1)
        .count()
    }

    for (n <- Seq(200000L, 800000L)) {
      val planted = n / 1000
      val results = (1 to 5).flatMap { _ =>
        Seq(false, true).map { hotForm =>
          val df = corpus(n)
          val t0 = System.nanoTime()
          val got = pairs(df, hotForm)
          val dt = (System.nanoTime() - t0) / 1e9
          sweep()
          assert(got >= (planted * 99) / 100,
            s"n=$n hotForm=$hotForm: planted $got/$planted below 99%")
          (hotForm, dt)
        }
      }
      for (hotForm <- Seq(false, true)) {
        val ts = results.filter(_._1 == hotForm).map(_._2).sorted
        val arm = if (hotForm) "hotTable " else "dfWindow "
        println(f"[probe] $arm n=$n median ${ts(ts.size / 2)}%6.2f s " +
          f"(${ts.map(t => f"$t%.2f").mkString(", ")})")
      }
    }
    spark.stop()
  }
}
