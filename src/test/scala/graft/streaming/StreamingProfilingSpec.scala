package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Profiling
import StreamingProfiling.{Keyed, Valued}

/** The streaming profiling twins must agree with the batch audit in
  * their exact regimes (distinct keys <= k per shard; distinct values
  * <= maxBins per group) and keep their documented degradation
  * guarantees outside them.
  */
class StreamingProfilingSpec extends SparkSuite {
  import spark.implicits._

  /** Latest emission per id columns from an Update-mode memory sink. */
  private def latest(table: String, ids: Seq[String], payload: Seq[String]) =
    spark.table(table)
      .withColumn("seq", monotonically_increasing_id())
      .groupBy(ids.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*), col("seq")).as("e"))
      .select(ids.map(col) ++ payload.map(p => col(s"e.$p").as(p)): _*)

  test("keySkew exact regime: cross-batch counts rebin to the batch audit") {
    implicit val ctx = spark.sqlContext
    // 4 distinct keys, k=8 → each shard stays under capacity → exact
    val evs = (Seq.fill(1)("k1") ++ Seq.fill(2)("k2") ++
      Seq.fill(4)("k4") ++ Seq.fill(5)("k5")).map(Keyed(_))
    val (b1, b2) = new scala.util.Random(7).shuffle(evs).splitAt(5)

    val in = MemoryStream[Keyed]
    val query = StreamingProfiling.keySkew(in.toDS(), k = 8, nShards = 3)
      .writeStream.format("memory").queryName("skew_stream")
      .outputMode("update").start()
    try {
      in.addData(b1: _*); query.processAllAvailable()
      in.addData(b2: _*); query.processAllAvailable()

      val perKey = latest("skew_stream", Seq("shard", "key"),
        Seq("count", "bucket"))
      // exact per-key counts, and the emitted bucket is the batch
      // audit's integer log2 arithmetic
      val counts = perKey.select("key", "count", "bucket")
        .as[(String, Long, Int)].collect().toSeq.sorted
      assert(counts == Seq(("k1", 1L, 0), ("k2", 2L, 1),
        ("k4", 4L, 2), ("k5", 5L, 2)))

      // rebinned, the streamed state reproduces Profiling.keySkew
      val streamedHist = perKey.groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_keys"), sum(col("count")).as("n_rows"),
          max(col("count")).as("max_key_rows"))
        .orderBy("bucket")
        .as[(Int, Long, Long, Long)].collect().toSeq
      val batchHist = Profiling.keySkew(
          evs.map(_.key).toDF("key"), "key")
        .orderBy("bucket").as[(Int, Long, Long, Long)].collect().toSeq
      assert(streamedHist == batchHist)
    } finally query.stop()
  }

  test("keySkew over capacity: the hot key survives with bounded undercount") {
    implicit val ctx = spark.sqlContext
    // one shard, k=3, 6 distinct keys: hot has 60 of n=100 rows —
    // frequency > n/(k+1) = 25, so MG must retain it with count
    // >= 60 - 100/4 = 35
    val evs = (Seq.fill(60)("hot") ++
      (1 to 40).map(i => s"cold${i % 5}")).map(Keyed(_))
    val in = MemoryStream[Keyed]
    val query = StreamingProfiling.keySkew(in.toDS(), k = 3, nShards = 1)
      .writeStream.format("memory").queryName("skew_mg")
      .outputMode("update").start()
    try {
      evs.grouped(25).foreach { b =>
        in.addData(b: _*); query.processAllAvailable() }
      val rows = latest("skew_mg", Seq("shard", "key"),
        Seq("count", "shardRows"))
        .as[(Int, String, Long, Long)].collect()
      val hot = rows.find(_._2 == "hot")
      assert(hot.isDefined, s"MG evicted the hot key: ${rows.toSeq}")
      assert(hot.get._3 >= 35L && hot.get._3 <= 60L, s"count ${hot.get._3}")
      assert(rows.head._4 == 100L) // exact shard total regardless of MG
      assert(rows.count(_._1 == 0) <= 3) // state bounded at k
    } finally query.stop()
  }

  test("histogram exact regime: rebinned state equals the batch histogram") {
    implicit val ctx = spark.sqlContext
    // group g: values 0..10 (11 distinct <= maxBins=16) over two
    // batches; group c single-valued — the batch spec's own corpus
    val evs = (0 to 10).map(v => Valued("g", v.toDouble)) ++
      Seq(Valued("c", 7.0), Valued("c", 7.0))
    val (b1, b2) = evs.splitAt(6)

    val in = MemoryStream[Valued]
    val query = StreamingProfiling.histogram(in.toDS(), maxBins = 16)
      .writeStream.format("memory").queryName("hist_stream")
      .outputMode("update").start()
    try {
      in.addData(b1: _*); query.processAllAvailable()
      in.addData(b2: _*); query.processAllAvailable()

      val state = latest("hist_stream", Seq("grp", "pos"),
        Seq("centroid", "count", "mn", "mx", "nRows"))
        .as[(String, Int, Double, Long, Double, Double, Long)].collect()
      // drop stale positions: only the freshest emission's rows (those
      // agreeing with the group's final nRows) are current state
      val current = state.filter(r => r._7 == evs.count(_.grp == r._1))

      val streamed = current.toSeq.map { case (g, _, c, n, mn, mx, _) =>
        (g, StreamingProfiling.toEquiWidthBin(c, mn, mx, 5), n) }
        .groupBy { case (g, bin, _) => (g, bin) }
        .map { case ((g, bin), rs) => (g, bin, rs.map(_._3).sum) }
        .toSeq.sorted
      val batch = Profiling.histogram(
          evs.map(e => (e.grp, e.v)).toDF("grp", "v"), "grp", "v", 5)
        .orderBy("grp", "bin").as[(String, Int, Long)].collect().toSeq
      assert(streamed == batch)
    } finally query.stop()
  }

  test("histogram over capacity: bounded bins, exact mass and range") {
    implicit val ctx = spark.sqlContext
    val rng = new scala.util.Random(11)
    val evs = (1 to 500).map(_ => Valued("g", rng.nextDouble() * 100))
    val in = MemoryStream[Valued]
    val query = StreamingProfiling.histogram(in.toDS(), maxBins = 8)
      .writeStream.format("memory").queryName("hist_mg")
      .outputMode("update").start()
    try {
      evs.grouped(200).foreach { b =>
        in.addData(b: _*); query.processAllAvailable() }
      val state = latest("hist_mg", Seq("grp", "pos"),
        Seq("centroid", "count", "mn", "mx", "nRows"))
        .as[(String, Int, Double, Long, Double, Double, Long)].collect()
        .filter(_._7 == 500L)
      assert(state.length <= 8)
      assert(state.map(_._4).sum == 500L) // no mass lost to merges
      assert(state.head._5 == evs.map(_.v).min)
      assert(state.head._6 == evs.map(_.v).max)
      // centroids stay sorted and inside the exact range
      val cs = state.sortBy(_._2).map(_._3)
      assert(cs.sameElements(cs.sorted))
      assert(cs.forall(c => c >= state.head._5 && c <= state.head._6))
    } finally query.stop()
  }
}
