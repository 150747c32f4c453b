package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Round-15 depth probe (VERDICT_r14 #7a): C8 batch decontamination
  * with a GROWING eval side. The scrub's candidate step is
  * `train_grams LEFT SEMI JOIN eval_gram_set ON sh`; the scaladoc's
  * "train never shuffled" claim rides on AQE broadcasting the eval
  * gram set. This probe grows the eval slice until that stops being
  * true and answers:
  *
  *   1. WHERE does the broadcast stop (eval fraction / distinct-gram
  *      count / estimated bytes vs the 10 MB autoBroadcast default)?
  *   2. Does the plan degrade GRACEFULLY — a shuffled semi-join (one
  *      extra train shuffle by sh, correct, no cliff) rather than
  *      anything pathological?
  *   3. Do the scrub totals stay byte-identical across the regime
  *      change? (The join algorithm must never change the answer.)
  *
  * Method: sf0.1 documents; eval = deterministic doc_id slices at
  * growing permille, train = the complement, so every arm's expected
  * output is a pure function of the slice. n=3 per arm, interleaved
  * reps; after each run the AQE-final plan is grepped for the
  * LeftSemi operator actually chosen.
  *
  * Run: sbt -batch "Test/runMain graft.ProbeC8EvalGrowth"
  */
object ProbeC8EvalGrowth {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .localCheckpoint(true)

    // eval slice: first `permille` of the id hash space — nested, so a
    // bigger slice strictly contains the smaller one
    def slice(permille: Int) = pmod(xxhash64(col("doc_id")), lit(1000)) < permille

    final case class Res(t: Double, rows: Long, removed: Long, semi: String)
    def run(permille: Int): Res = {
      val df = Dedup.scrubContamination(
        docs.filter(!slice(permille)), docs.filter(slice(permille)),
        "doc_id", "text", 5, minSpanLen = 8)
      val t0 = System.nanoTime()
      val agg = df.agg(count(lit(1)), coalesce(sum(col("removed_tokens")), lit(0L))).head()
      val t = (System.nanoTime() - t0) / 1e9
      val plan = df.queryExecution.executedPlan.toString
      val semi = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) LeftSemi".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq.distinct.mkString("+")
      Res(t, agg.getLong(0), agg.getLong(1), if (semi.isEmpty) "?" else semi)
    }

    spark.range(1000000).selectExpr("sum(id * 2)")
      .write.format("noop").mode("overwrite").save()

    val permilles = Seq(2, 20, 100, 300, 500)
    val acc = scala.collection.mutable.Map.empty[Int, List[Res]].withDefaultValue(Nil)
    for (rep <- 1 to 3; p <- permilles) {
      val r = run(p)
      acc(p) = acc(p) :+ r
      println(f"[rep $rep] eval=$p%3d permille  ${r.t}%6.2f s  " +
        f"affected=${r.rows}%-6d removed=${r.removed}%-8d semi=${r.semi}")
    }
    println("== medians ==")
    permilles.foreach { p =>
      val rs = acc(p)
      assert(rs.map(r => (r.rows, r.removed)).distinct.size == 1,
        s"scrub totals varied across reps at $p permille!")
      val med = rs.map(_.t).sorted.apply(1)
      println(f"[probe] eval=$p%3d permille  median $med%6.2f s  " +
        f"affected=${rs.head.rows}%-6d removed=${rs.head.removed}%-8d " +
        f"semi=${rs.map(_.semi).distinct.mkString("/")}")
    }
    spark.stop()
  }
}
