package graft
import org.apache.spark.sql.SparkSession
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
      val t0 = System.nanoTime(); f
      println(f"[probe] $name%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    time("warmup")(noop(spark.range(1000000).selectExpr("sum(id*2)")))

    val docs = {
      val d = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
      d.union(d.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    }
    docs.cache().count()

    // current: md5 per gram string
    val cur = graft.operators.Dedup.shingleSets(docs, "doc_id", "text", 3)
    time("shingleSets md5-per-gram")(noop(cur))
    time("shingleSets md5-per-gram 2")(noop(cur))

    // variant: hash tokens once, combine per gram
    val comb = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 3)
      .withColumn("th", expr("transform(toks, t -> CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT) % 1073741824)"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(th) - 3), i -> (1000003 * element_at(th, i+1) + 999983 * element_at(th, i+2) + 31 * element_at(th, i+3)) % 1152921504606846976)")).as("sh"))
      .distinct()
    time("shingleSets token-combine")(noop(comb))
    time("shingleSets token-combine 2")(noop(comb))

    // variant: xxhash per gram (production path)
    val xx = graft.operators.Dedup.shingleSets(docs, "doc_id", "text", 3,
      tokenHash = c => graft.functions.Hashing.xx60(c) % 1073741824L)
    time("shingleSets xxhash-per-gram")(noop(xx))
    spark.stop()
  }
}
