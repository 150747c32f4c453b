package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Drift
import StreamingDrift.Valued

/** The streaming PSI must equal the batch Drift.psi round-6 value when
  * the stream replays the current-side corpus — same bins, same
  * smoothing, same accumulation order.
  */
class StreamingDriftSpec extends SparkSuite {
  import spark.implicits._

  private val nBins = 8

  test("replaying the current side reproduces the batch PSI exactly") {
    implicit val ctx = spark.sqlContext
    val rngR = new scala.util.Random(3)
    val rngC = new scala.util.Random(4)
    val refRows = (1 to 600).map(_ => Valued(s"g${rngR.nextInt(3)}",
      rngR.nextDouble() * 50))
    // current drawn from a shifted distribution + outliers beyond the
    // reference range (exercises the clamp on the streaming side)
    val curRows = (1 to 500).map(_ => Valued(s"g${rngC.nextInt(3)}",
      rngC.nextDouble() * 70 - 10))

    val refDf = refRows.map(v => (v.grp, v.v)).toDF("grp", "v")
    val curDf = curRows.map(v => (v.grp, v.v)).toDF("grp", "v")
    val batch = Drift.psi(refDf, curDf, "grp", "v", nBins)
      .select("grp", "psi").distinct()
      .as[(String, Double)].collect().toMap

    val profile = StreamingDrift.referenceProfile(refDf, "grp", "v", nBins)
    val in = MemoryStream[Valued]
    val query = StreamingDrift.psiVsReference(in.toDS(), profile, nBins)
      .writeStream.format("memory").queryName("drift_stream")
      .outputMode("update").start()
    try {
      curRows.grouped(180).foreach { b =>
        in.addData(b: _*); query.processAllAvailable() }
      val streamed = spark.table("drift_stream")
        .withColumn("seq", monotonically_increasing_id())
        .groupBy("grp")
        .agg(max_by(struct(col("nCur"), col("psi")), col("seq")).as("e"))
        .select(col("grp"), col("e.nCur"), col("e.psi"))
        .as[(String, Long, Double)].collect()
      assert(streamed.map(_._1).toSet == batch.keySet)
      streamed.foreach { case (g, n, psi) =>
        assert(n == curRows.count(_.grp == g))
        assert(psi == batch(g), s"$g: streaming $psi != batch ${batch(g)}")
      }
    } finally query.stop()
  }

  test("streaming binned KS equals the batch operator on replay") {
    implicit val ctx = spark.sqlContext
    val rngR = new scala.util.Random(41)
    val rngC = new scala.util.Random(43)
    val refRows = (1 to 500).map(_ => ("g", rngR.nextDouble() * 30))
    val curRows = (1 to 400).map(_ => Valued("g", rngC.nextDouble() * 45 - 5))

    val refDf = refRows.toDF("grp", "v")
    val both = refRows.map { case (g, v) => (g, v, true) } ++
      curRows.map(v => (v.grp, v.v, false))
    val batch = Drift.ksBinnedSplit(both.toDF("grp", "v", "is_ref"),
        col("is_ref"), "grp", "v", nBins)
      .select("n_cur", "d_num", "ks").as[(Long, Long, Double)].head()

    val profile = StreamingDrift.referenceProfile(refDf, "grp", "v", nBins)
    val in = MemoryStream[Valued]
    val query = StreamingDrift.ksVsReference(in.toDS(), profile, nBins)
      .writeStream.format("memory").queryName("ksdrift_stream")
      .outputMode("update").start()
    try {
      curRows.grouped(150).foreach { b =>
        in.addData(b: _*); query.processAllAvailable() }
      val last = spark.table("ksdrift_stream")
        .withColumn("seq", monotonically_increasing_id())
        .orderBy(col("seq").desc)
        .select("nCur", "dNum", "ks")
        .as[(Long, Long, Double)].head()
      assert(last == batch, s"stream $last != batch $batch")
    } finally query.stop()
  }

  test("bin-count state survives a checkpointed restart") {
    implicit val ctx = spark.sqlContext
    val refDf = (0 until 100).map(i => ("g", (i % 10).toDouble))
      .toDF("grp", "v")
    val profile = StreamingDrift.referenceProfile(refDf, "grp", "v", nBins)
    val curRows = (0 until 10).map(i => Valued("g", (i % 4).toDouble))
    val (c1, c2) = curRows.splitAt(5)

    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-drift-ckpt").toString
    val in = MemoryStream[Valued]
    val got = new java.util.concurrent.ConcurrentLinkedQueue[StreamingDrift.PsiRow]
    def start() = StreamingDrift.psiVsReference(in.toDS(), profile, nBins)
      .writeStream
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[StreamingDrift.PsiRow], _: Long) =>
          df.collect().foreach(got.add)
      }
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()

    val q1 = start()
    try { in.addData(c1: _*); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try {
      in.addData(c2: _*); q2.processAllAvailable()
      val last = got.toArray(Array.empty[StreamingDrift.PsiRow]).last
      // restored state: the second emission covers ALL 10 rows and its
      // psi equals the batch value over the full current side
      assert(last.nCur == 10L, s"state lost across restart: $last")
      val batch = Drift.psi(refDf,
          curRows.map(v => (v.grp, v.v)).toDF("grp", "v"), "grp", "v", nBins)
        .select("psi").distinct().as[Double].head()
      assert(last.psi == batch)
    } finally q2.stop()
  }

  test("groups unseen in the reference emit nothing; state stays bounded") {
    implicit val ctx = spark.sqlContext
    val refDf = (1 to 50).map(i => ("known", i.toDouble)).toDF("grp", "v")
    val profile = StreamingDrift.referenceProfile(refDf, "grp", "v", nBins)
    val in = MemoryStream[Valued]
    val query = StreamingDrift.psiVsReference(in.toDS(), profile, nBins)
      .writeStream.format("memory").queryName("drift_unknown")
      .outputMode("update").start()
    try {
      in.addData(Valued("ghost", 1.0), Valued("known", 25.0))
      query.processAllAvailable()
      val rows = spark.table("drift_unknown")
        .select("grp").as[String].collect().toSeq
      assert(rows == Seq("known"))
    } finally query.stop()
  }

  test("streaming chi-square equals the batch operator on replay") {
    implicit val ctx = spark.sqlContext
    import StreamingDrift.Categorized
    val rngR = new scala.util.Random(7)
    val rngC = new scala.util.Random(8)
    val refRows = (1 to 400).map(_ => Categorized(s"g${rngR.nextInt(3)}",
      s"c${rngR.nextInt(4)}"))
    // current side: shifted mix + a category the reference never saw
    val curRows = (1 to 300).map { i =>
      Categorized(s"g${rngC.nextInt(3)}",
        if (i % 41 == 0) "novel" else s"c${rngC.nextInt(4) / 2}")
    }

    // batch: one frame split by a side flag, the operator's shape
    val both = (refRows.map(c => (c.grp, c.cat, true)) ++
      curRows.map(c => (c.grp, c.cat, false))).toDF("grp", "cat", "r")
    val batch = Drift.chiSquareSplit(both, col("r"), "grp", "cat",
        alpha = 0.5)
      .select("grp", "chi2").distinct()
      .as[(String, Double)].collect().toMap

    val profile = StreamingDrift.referenceCategories(
      refRows.map(c => (c.grp, c.cat)).toDF("grp", "cat"), "grp", "cat")
    val in = MemoryStream[Categorized]
    val query = StreamingDrift.chiVsReference(in.toDS(), profile)
      .writeStream.format("memory").queryName("chi_stream")
      .outputMode("update").start()
    try {
      curRows.grouped(110).foreach { b =>
        in.addData(b: _*); query.processAllAvailable() }
      val streamed = spark.table("chi_stream")
        .withColumn("seq", monotonically_increasing_id())
        .groupBy("grp")
        .agg(max_by(struct(col("nCur"), col("chi2")), col("seq")).as("e"))
        .select(col("grp"), col("e.nCur"), col("e.chi2"))
        .as[(String, Long, Double)].collect()
      assert(streamed.map(_._1).toSet == batch.keySet)
      streamed.foreach { case (g, n, chi2) =>
        assert(n == curRows.count(_.grp == g))
        assert(chi2 == batch(g), s"group $g: streamed $chi2 vs batch")
      }
    } finally query.stop()
  }
}
