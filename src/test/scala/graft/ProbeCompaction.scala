package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** P13b scale evidence: the compactor on a production-shaped problem —
  * a 1M-row corpus (sf0.1 documents replicated 200x, ids re-keyed)
  * fragmented into ~2000 batch-sized files, compacted toward 100k
  * records/file. Reports wall, file counts, throughput, and the
  * verification frame's matched flags (the probe FAILS loudly on any
  * mismatch — throughput of a wrong rewrite is not a number worth
  * recording). Untimed gate; n=3 medians like ProbeReleaseThroughput.
  */
object ProbeCompaction {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "200").toInt
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val corpus = docs
      .withColumn("__r", explode(sequence(lit(0), lit(reps - 1))))
      .select((col("doc_id") * reps + col("__r")).as("doc_id"),
        col("source"), col("text"))
    val tmpBase = s"${System.getProperty("java.io.tmpdir")}/graft_cpt_probe_" +
      spark.sparkContext.applicationId
    val src = s"$tmpBase/src"
    graft.operators.Release.deleteOnExit(tmpBase)
    // fragment: batch-sized files, the post-incremental-append shape
    corpus.write.mode("overwrite").option("maxRecordsPerFile", 500L)
      .partitionBy("source").parquet(src)
    def countFiles(p: String): Int = {
      def c(f: java.io.File): Int =
        if (f.isDirectory) Option(f.listFiles).map(_.map(c).sum).getOrElse(0)
        else if (f.getName.endsWith(".parquet")) 1 else 0
      c(new java.io.File(p))
    }
    val (nRows, nBytes) = {
      val r = corpus.selectExpr("count(*)", "sum(length(text))").collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val filesBefore = countFiles(src)
    val ts = (1 to 3).map { i =>
      val dst = s"$tmpBase/dst$i"
      val t0 = System.nanoTime()
      val rep = graft.operators.Release.compact(spark, src, dst,
        "source", "doc_id", "text", targetRecordsPerFile = 100000L)
      val bad = rep.filter(!col("matched")).count()
      val wall = (System.nanoTime() - t0) / 1e9
      require(bad == 0L, s"compaction mismatch on $bad partition(s)")
      (wall, countFiles(dst))
    }
    val med = ts.map(_._1).sorted.apply(1)
    println(f"[probe] compact $nRows rows / ${nBytes / 1e6}%.1f MB text: " +
      f"$filesBefore files -> ${ts.head._2} files, median $med%.2f s " +
      f"(${nBytes / 1e6 / med}%.1f MB/s incl. verification read-back) " +
      f"(${ts.map(t => f"${t._1}%.2f").mkString(", ")})")
    spark.stop()
  }
}
