package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-slope probe for the D7/D7b substring-dedup family (the
  * ProbeScale pattern): the zero-pair-fanout claim is that cost is
  * linear in corpus gram volume — candidate work is one groupBy on
  * the gram hash plus a semi-join, NEVER doc pairs — so doubling the
  * corpus should double wall-clock, even when shared passages have
  * high document frequency (a df-1000 passage gram costs one
  * counter, where a pair-fanout design would emit ~500k pairs PER
  * GRAM).
  *
  * Corpus: synthetic docs of 30 unique filler tokens + a 10-token
  * passage shared across one of 1000 groups, so passage-gram df grows
  * WITH the corpus (n/1000: 100 -> 400 — the stop-phrase regime
  * where pair fanout would grow quadratically while the df-count
  * stays one counter). Both D7 (per-doc passage report) and D7b
  * (span-length distribution) are timed on the same frames.
  * Run: sbt -batch "Test/runMain graft.ProbeScaleSubstr"
  */
object ProbeScaleSubstr {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[probe] $name median ${ts.sorted.apply(1)}%.2f s (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    // doc i: 15 unique tokens, the group passage, 15 more unique
    // tokens — every doc qualifies with exactly one maximal span
    def corpus(n: Long) = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ",
        expr("concat_ws(' ', transform(sequence(1, 15), j -> concat('u', id, '_', j)))"),
        expr("concat_ws(' ', transform(sequence(1, 10), j -> concat('p', id % 1000, '_', j)))"),
        expr("concat_ws(' ', transform(sequence(16, 30), j -> concat('u', id, '_', j)))"))
        .as("text"))

    for (n <- Seq(100000L, 200000L, 400000L)) {
      val c = corpus(n).localCheckpoint(eager = true)
      time(s"D7 dupPassages docs=$n (df~${n / 1000} per passage gram)") {
        noop(graft.operators.Dedup.dupPassages(c, "doc_id", "text", 5)) }
      time(s"D7b dupSubstrings docs=$n") {
        noop(graft.operators.Dedup.dupSubstrings(c, "doc_id", "text", 5)) }
      c.unpersist()
    }
    spark.stop()
  }
}
