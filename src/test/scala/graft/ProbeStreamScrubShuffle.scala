package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup
import graft.streaming.StreamingDecontaminate

/** Measures the ADVICE_r13 medium fix in StreamingDecontaminate: the
  * r13 shape carried the doc's FULL token array on every hit row into
  * the per-doc regroup, so a boilerplate-heavy doc (most grams hitting
  * eval) cost O(hits x doc_len) shuffle+materialization — quadratic in
  * doc length. The shipped r14 shape folds contiguous same-doc runs
  * per-partition into ONE toks copy per doc BEFORE the shuffle, so the
  * same doc costs O(doc_len).
  *
  * The r13 shape is reconstructed HERE (probe-local `legacyScrub`,
  * faithful to the pre-fix operator: gram explode -> broadcast eval
  * join -> groupByKey over toks-carrying Hit rows -> rows.toSeq fold).
  * Corpus: every doc is a tiny unique frame around a FULL copy of ONE
  * eval passage of L tokens (worst case: hits ~ L-n+1), so legacy
  * moves ~D x L^2 token copies and shipped ~D x L. Each arm asserts
  * its rows EXACTLY against the arithmetic expectation (n_tokens,
  * removed, spans, keep_hash of the 3 kept frame tokens), so the arms
  * are parity-checked through the shared expectation even though they
  * run in separate JVMs.
  *
  * One arm per JVM on purpose: in local mode the legacy arm's group
  * fold OOMs the executor thread and Spark's uncaught handler kills
  * the WHOLE JVM — a crash IS a valid measurement outcome and must not
  * take later arms with it. Drive with:
  *   for len in 500 1000 2000; do for arm in shipped legacy; do
  *     sbt -batch "Test/runMain graft.ProbeStreamScrubShuffle $arm $len" \
  *       || echo "[probe] scrub $arm docLen=$len DIED (executor OOM)";
  *   done; done
  */
object ProbeStreamScrubShuffle {

  final case class Doc(doc_id: Long, text: String)

  /** The r13 operator shape, reconstructed for the measurement arm. */
  private def legacyScrub(stream: DataFrame, eval: DataFrame, n: Int,
      minSpanLen: Int) = {
    val spark = stream.sparkSession
    import spark.implicits._
    val evalSh = Dedup.shingleSets(eval, "doc_id", "text", n)
      .select("sh").distinct()
    val combine = (0 until n)
      .map(k => s"${Dedup.ShingleCoef(k)}L * element_at(th, i + ${k + 1})")
      .mkString(" + ")
    val grams = stream
      .select(col("doc_id"), col("text").as("__text"))
      .withColumn("toks", Dedup.tokens(col("__text")))
      .filter(size(col("toks")) >= n)
      .withColumn("th", transform(col("toks"), t => graft.functions.Hashing.h30(t)))
      .select(col("doc_id"), col("toks"),
        posexplode(expr(s"transform(sequence(0, size(th) - $n), i -> $combine)"))
          .as(Seq("pos0", "sh")))
      .select(col("doc_id"), (col("pos0") + 1).cast("int").as("pos"),
        col("toks"), col("sh"))
    // r13: every hit row carries toks into the regroup
    val hits = grams.join(broadcast(evalSh), Seq("sh"))
      .select(col("doc_id"), col("pos"), col("toks"))
      .as[StreamingDecontaminate.Hit]
    val nGram = n
    val minLen = minSpanLen
    def emit(docId: Long, rows: Iterator[StreamingDecontaminate.Hit],
        state: GroupState[Boolean]): Iterator[StreamingDecontaminate.Scrubbed] = {
      def md5Hex(s: String): String =
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val hs = rows.toSeq // r13: EVERY toks copy materialized at once
      val toks = hs.head.toks
      val covered = hs.map(_.pos)
        .flatMap(p => p until p + nGram).distinct.sorted
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      for (tp <- covered) {
        if (spans.nonEmpty && tp == spans.last._1 + spans.last._2)
          spans(spans.length - 1) = (spans.last._1, spans.last._2 + 1)
        else spans += ((tp, 1))
      }
      val qual = spans.filter(_._2 >= minLen)
      if (qual.isEmpty) Iterator.empty
      else {
        val cov = qual.flatMap { case (s0, l) => s0 until s0 + l }.toSet
        val kept = toks.zipWithIndex.collect {
          case (t, i) if !cov.contains(i + 1) => t
        }
        Iterator(StreamingDecontaminate.Scrubbed(docId, toks.length.toLong,
          cov.size.toLong, qual.length.toLong, md5Hex(kept.mkString(" "))))
      }
    }
    hits.groupByKey(_.doc_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(emit)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  def main(args: Array[String]): Unit = {
    val arm = args(0)
    val len = args(1).toInt
    val reps = if (args.length > 2) args(2).toInt else 3
    val nDocs = 50

    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    def passage(l: Int): String = (1 to l).map(i => s"E$i").mkString(" ")

    def run(l: Int, timed: Boolean): Double = {
      val evalDf = Seq((9000L, passage(l))).toDF("doc_id", "text")
        .localCheckpoint(eager = true)
      val mem = MemoryStream[Doc]
      val out = arm match {
        case "shipped" => StreamingDecontaminate.scrub(
          mem.toDF(), evalDf, "doc_id", "text", n = 5, minSpanLen = 8)
        case "legacy" => legacyScrub(mem.toDF(), evalDf, 5, 8)
      }
      val name = s"scrub_${arm}_$l"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        // every doc: 2-token unique prefix + FULL eval passage + 1 tail
        mem.addData((1 to nDocs).map(i =>
          Doc(i.toLong, s"u${i}a u${i}b ${passage(l)} u${i}c")): _*)
        val t0 = System.nanoTime()
        q.processAllAvailable()
        val dt = (System.nanoTime() - t0) / 1e9
        if (timed) {
          val rows = spark.table(name).collect()
            .map(r => r.getAs[Long]("doc_id") ->
              ((r.getAs[Long]("n_tokens"), r.getAs[Long]("removed_tokens"),
                r.getAs[Long]("n_spans_removed"), r.getAs[String]("keep_hash"))))
            .toMap
          // exact expectation: the passage (positions 3..l+2) is the
          // one removed span; the 3 frame tokens survive
          val expect = (1 to nDocs).map(i => i.toLong ->
            ((l + 3L, l.toLong, 1L, md5Hex(s"u${i}a u${i}b u${i}c")))).toMap
          assert(rows == expect, s"$arm len=$l rows diverge from expectation")
        }
        dt
      } finally {
        q.stop()
        spark.sql(s"DROP VIEW IF EXISTS $name")
        evalDf.unpersist(blocking = true)
        System.gc()
      }
    }

    run(100, timed = false) // JIT/codegen warm-up, untimed
    val ts = (1 to reps).map(_ => run(len, timed = true))
    println(f"[probe] scrub $arm%-7s docLen=$len%5d docs=$nDocs " +
      f"median ${ts.sorted.apply((reps - 1) / 2)}%7.2f s " +
      f"(${ts.map(t => f"$t%.2f").mkString(", ")})")
    spark.stop()
  }
}
