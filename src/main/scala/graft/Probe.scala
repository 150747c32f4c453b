package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-36s median ${ts.sorted.apply(1)}%.2f s  (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    time("warmup")(noop(spark.range(1000000).selectExpr("sum(id*2)")))

    val docs = {
      val d = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
      d.union(d.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    }

    val h30 = graft.functions.Hashing.h30 _
    val sets = graft.operators.Dedup.shingleSets(docs, "doc_id", "text", 3, h30)

    time("q_dedup_ngram current")(
      noop(graft.operators.Dedup.ngramJaccard(docs, "doc_id", "text", 3, 1, 2, h30, maxDf = 100L)))

    time("stage: shingleSets alone")(noop(sets))

    time("stage: df window split")(noop(
      sets.withColumn("__df", count(lit(1)).over(Window.partitionBy(col("sh"))))))

    val dfTbl = sets.groupBy(col("sh")).agg(count(lit(1)).as("__df"))
    time("stage: df groupBy+join split")(noop(sets.join(dfTbl, "sh")))

    // variant: df via groupBy+join instead of the window sort
    def ngramViaGroupByDf(): org.apache.spark.sql.DataFrame = {
      val dfT = sets.groupBy(col("sh")).agg(count(lit(1)).as("__df"))
      val withDf = sets.join(dfT, "sh")
      val rare = withDf.filter(col("__df") <= 100L).drop("__df")
      val hot = withDf.filter(col("__df") > 100L).drop("__df")
      val rareShared = graft.operators.Dedup.sharedCounts(rare)
      val hotShared = rareShared.select("doc_a", "doc_b")
        .join(hot.select(col("doc_id").as("doc_a"), col("sh")), "doc_a")
        .join(hot.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("__hot"))
      val shared = rareShared.join(hotShared, Seq("doc_a", "doc_b"), "left")
        .select(col("doc_a"), col("doc_b"),
          (col("shared") + coalesce(col("__hot"), lit(0L))).as("shared"))
      graft.operators.Dedup.jaccardFilter(shared, sets, 1, 2)
    }
    time("q_dedup_ngram groupBy-df variant")(noop(ngramViaGroupByDf()))

    // variant: materialize the df-split index once (localCheckpoint),
    // derive rare/hot/sizes from the materialized rows
    def ngramViaCheckpoint(): org.apache.spark.sql.DataFrame = {
      val withDf = sets.withColumn("__df",
        count(lit(1)).over(Window.partitionBy(col("sh")))).localCheckpoint()
      val rare = withDf.filter(col("__df") <= 100L).drop("__df")
      val hot = withDf.filter(col("__df") > 100L).drop("__df")
      val rareShared = graft.operators.Dedup.sharedCounts(rare)
      val hotShared = rareShared.select("doc_a", "doc_b")
        .join(hot.select(col("doc_id").as("doc_a"), col("sh")), "doc_a")
        .join(hot.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("__hot"))
      val shared = rareShared.join(hotShared, Seq("doc_a", "doc_b"), "left")
        .select(col("doc_a"), col("doc_b"),
          (col("shared") + coalesce(col("__hot"), lit(0L))).as("shared"))
      val sizes = withDf.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      shared
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), "doc_b")
        .filter(lit(3L) * col("shared") >= lit(1L) * (col("n_a") + col("n_b")))
        .withColumn("jaccard",
          round(col("shared") / (col("n_a") + col("n_b") - col("shared")), 4))
        .select("doc_a", "doc_b", "shared", "n_a", "n_b", "jaccard")
    }
    time("q_dedup_ngram checkpoint variant")(noop(ngramViaCheckpoint()))

    time("q_dedup_minhash current")(
      noop(graft.operators.Dedup.minhashLsh(docs, "doc_id", "text", 3, 1, 2, h30)))

    def minhashCkpt(ckptBands: Boolean): org.apache.spark.sql.DataFrame = {
      val sets2 = graft.operators.Dedup.shingleSets(docs, "doc_id", "text", 3, h30)
        .localCheckpoint()
      val bands0 = graft.operators.Dedup.bandHashes(
        graft.operators.Dedup.minhashSignatures(sets2))
      val bands = if (ckptBands) bands0.localCheckpoint() else bands0
      val cand = bands.as("x")
        .join(bands.as("y"), Seq("band", "bh"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      graft.operators.Dedup.jaccardFilter(
        graft.operators.Dedup.exactShared(cand, sets2), sets2, 1, 2)
    }
    time("q_dedup_minhash ckpt(sets)")(noop(minhashCkpt(false)))
    time("q_dedup_minhash ckpt(sets+bands)")(noop(minhashCkpt(true)))

    val mhPairs = graft.operators.Dedup.minhashLsh(docs, "doc_id", "text", 3, 1, 2, h30)
      .select("doc_a", "doc_b")
    time("q_dedup_clusters current")(
      noop(graft.operators.Dedup.clusters(docs, "doc_id", mhPairs)))
    val mhPairsCk = minhashCkpt(false).select("doc_a", "doc_b")
    time("q_dedup_clusters ckpt pairs")(
      noop(graft.operators.Dedup.clusters(docs, "doc_id", mhPairsCk)))

    spark.stop()
  }
}
