package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** P13c scale evidence: audit append (full double re-scan) vs the
  * O(batch) incremental path, appending a 5k-doc batch to a 1M-row
  * release (the ProbeCompaction corpus). Arms INTERLEAVED within one
  * JVM (the §26/§28 discipline — sequential arm blocks drift with the
  * box); each append goes to a fresh copy-free state by appending
  * DISTINCT id ranges, so both arms do identical write work and the
  * delta is pure verification cost. Fails loudly on any mismatch.
  */
object ProbeAppend {
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
    val tmpBase = s"${System.getProperty("java.io.tmpdir")}/graft_app_probe_" +
      spark.sparkContext.applicationId
    val rel = s"$tmpBase/release"
    graft.operators.Release.deleteOnExit(tmpBase)
    var stored = graft.operators.Release.writeAndManifest(corpus, rel,
      "source", "doc_id", "text").localCheckpoint(true)
    val nRows = corpus.count()
    def batchAt(i: Int) = docs.select(
      (col("doc_id") + lit(10000000L * (i + 1))).as("doc_id"),
      col("source"), col("text"))
    val audit = collection.mutable.ArrayBuffer[Double]()
    val inc = collection.mutable.ArrayBuffer[Double]()
    for (i <- 0 until 6) {
      val b = batchAt(i)
      val t0 = System.nanoTime()
      if (i % 2 == 0) {
        val rep = graft.operators.Release.appendAndManifest(b, rel,
          "source", "doc_id", "text")
        require(rep.filter(!col("matched")).count() == 0L, "audit mismatch")
        audit += (System.nanoTime() - t0) / 1e9
        // keep the stored manifest current for the next incremental arm
        stored = graft.operators.Release.manifest(
          spark.read.parquet(rel), "source", "doc_id", "text")
          .localCheckpoint(true)
      } else {
        val m = graft.operators.Release.appendIncremental(b, rel, stored,
          "source", "doc_id", "text").localCheckpoint(true)
        require(m.filter(!col("matched")).count() == 0L, "inc mismatch")
        inc += (System.nanoTime() - t0) / 1e9
        stored = m
      }
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    println(f"[probe] append 5k batch onto $nRows-row release: " +
      f"audit(full double re-scan) median ${med(audit.toSeq)}%.2f s " +
      f"(${audit.map(t => f"$t%.2f").mkString(", ")}) vs " +
      f"incremental(O(batch)) median ${med(inc.toSeq)}%.2f s " +
      f"(${inc.map(t => f"$t%.2f").mkString(", ")})")
    spark.stop()
  }
}
