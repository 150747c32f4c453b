package graft
import org.apache.spark.sql.SparkSession

/** The other half of the q_release_manifest split (VERDICT_r11 #5 /
  * SURVEY §20 #4): the GATE keeps tiny maxRecordsPerFile over a
  * 4-source subset (multi-file partitions + cross-file reassembly are
  * what it exists to prove), while THIS probe measures the
  * production-shaped write — the FULL corpus at the default
  * maxRecordsPerFile=1M (one file per partition per task, the 100 TB
  * layout) — so the write-throughput number lives here instead of
  * inflating the bench as a fake operator cost. Untimed gate; n=3
  * medians for the artifact, plus the tiny-file variant for contrast.
  */
object ProbeReleaseThroughput {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val (nRows, nBytes) = {
      val r = docs.selectExpr("count(*)", "sum(length(text))").collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    def run(label: String, maxRecords: Long): Unit = {
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_release_probe_" +
        spark.sparkContext.applicationId
      graft.operators.Release.deleteOnExit(tmp)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.operators.Release.writeAndManifest(docs, tmp, "source",
          "doc_id", "text", maxRecordsPerFile = maxRecords)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val med = ts.sorted.apply(1)
      val files = {
        def count(f: java.io.File): Int =
          if (f.isDirectory) Option(f.listFiles).map(_.map(count).sum).getOrElse(0)
          else if (f.getName.endsWith(".parquet")) 1 else 0
        count(new java.io.File(tmp))
      }
      println(f"[probe] $label: median $med%.2f s ($nRows rows, " +
        f"${nBytes / 1e6}%.1f MB text, $files files, " +
        f"${nBytes / 1e6 / med}%.1f MB/s incl. manifest read-back) " +
        f"(${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    run("write+manifest full corpus, maxRecordsPerFile=1M (production)", 1000000L)
    run("write+manifest full corpus, maxRecordsPerFile=10 (gate shape)", 10L)
    spark.stop()
  }
}
