package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
      val t0 = System.nanoTime(); f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    time("warmup")(noop(spark.range(1000000).selectExpr("sum(id*2)")))

    import graft.operators.Dedup
    val docs = {
      val d = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
      d.union(d.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    }
    val sets = Dedup.shingleSets(docs, "doc_id", "text", 3)
    time("shingleSets")(noop(sets))
    val sims = Dedup.simhashes(docs, "doc_id", "text")
    time("simhashes")(noop(sims))
    time("simhashNearDup")(noop(Dedup.simhashNearDup(docs, "doc_id", "text", 3)))
    time("simhashNearDup 2nd")(noop(Dedup.simhashNearDup(docs, "doc_id", "text", 3)))
    spark.stop()
  }
}
