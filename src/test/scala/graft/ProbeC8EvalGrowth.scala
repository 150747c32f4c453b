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
  *   1. WHERE does the broadcast stop (eval doc count / distinct-gram
  *      bytes vs the 10 MB autoBroadcast default)?
  *   2. Does the plan degrade GRACEFULLY — a shuffled semi-join (one
  *      extra train shuffle by sh, correct, no cliff) rather than
  *      anything pathological?
  *   3. Do the scrub totals stay identical across reps within each
  *      regime? (The join algorithm must never change the answer.)
  *
  * Corpus: synthetic 400k docs x 50 tokens (sf0.1's documents table
  * tops out ~5k docs — every slice broadcasts, nothing to probe), 1%
  * of docs carry a planted shared 12-token passage so the scrub has
  * real work. Eval slices are nested id-hash cuts; at ~50 grams/doc
  * the eval gram set crosses 10 MB around 25-30k eval docs, i.e.
  * between the 20 and 100 permille arms.
  *
  * Method: n=3 interleaved reps; each rep DRIVES the scrub's own
  * queryExecution to completion (the PlanDump device — a noop write
  * would finalize a different command's plan) and greps the AQE-final
  * plan for the semi-join operator actually chosen.
  *
  * Run: sbt -batch "Test/runMain graft.ProbeC8EvalGrowth"
  * (SPARK_DRIVER_MEM=16g+)
  */
object ProbeC8EvalGrowth {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val planted = (1 to 12).map(i => s"P$i").mkString(" ")
    // regenerated per rep + full sweep after (§27 #4 probe hygiene:
    // the scrub materializes an O(corpus) base index per run, and
    // without the sweep later reps measure earlier reps' resident
    // blocks, not the join)
    def mkDocs() = spark.range(400000)
      .select(col("id").as("doc_id"), expr(
        s"""concat_ws(' ',
           |  concat_ws(' ', transform(sequence(1, 50), j -> concat('w', id, '_', j))),
           |  CASE WHEN id % 100 = 1 THEN '$planted' ELSE '' END)"""
          .stripMargin).as("text"))
      .localCheckpoint(true)

    // eval slice: nested id-hash cuts (a bigger slice contains the
    // smaller), so expected hits grow monotonically
    def slice(permille: Int) = pmod(xxhash64(col("doc_id")), lit(1000)) < permille

    final case class Res(t: Double, rows: Long, removed: Long, semi: String)
    def run(docs: org.apache.spark.sql.DataFrame, permille: Int): Res = {
      val df = Dedup.scrubContamination(
        docs.filter(!slice(permille)), docs.filter(slice(permille)),
        "doc_id", "text", 5, minSpanLen = 8)
      val qe = df.queryExecution
      val t0 = System.nanoTime()
      qe.toRdd.foreachPartition(_ => ())
      val t = (System.nanoTime() - t0) / 1e9
      val plan = qe.executedPlan.toString
      // toString prints the join type AFTER the key lists:
      // "BroadcastHashJoin [sh], [sh], LeftSemi, BuildRight, false"
      val semi = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)[^\\n]*LeftSemi".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq.distinct.mkString("+")
      val agg = df.agg(count(lit(1)),
        coalesce(sum(col("removed_tokens")), lit(0L))).head()
      Res(t, agg.getLong(0), agg.getLong(1), if (semi.isEmpty) "?" else semi)
    }

    spark.range(1000000).selectExpr("sum(id * 2)")
      .write.format("noop").mode("overwrite").save()

    val permilles = Seq(2, 20, 100, 300)
    val acc = scala.collection.mutable.Map.empty[Int, List[Res]].withDefaultValue(Nil)
    for (rep <- 1 to 3) {
      val docs = mkDocs()
      for (p <- permilles) {
        val r = run(docs, p)
        acc(p) = acc(p) :+ r
        println(f"[rep $rep] eval=$p%3d permille  ${r.t}%6.2f s  " +
          f"affected=${r.rows}%-6d removed=${r.removed}%-8d semi=${r.semi}")
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
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
