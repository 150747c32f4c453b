package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.Moments
import StreamingMoments.Vec

class StreamingMomentsSpec extends SparkSuite {
  import spark.implicits._

  private val dim = 8

  // deterministic pseudo-embeddings with mixed signs and magnitudes
  private def vecOf(g: Int, r: Int): Seq[Double] =
    (0 until dim).map(d =>
      ((g * 37 + r * 13 + d * 7) % 200 - 100) / 97.0)

  test("streamed matrices equal the batch aggregate bit-for-bit across splits") {
    implicit val ctx = spark.sqlContext
    val rows = for (g <- 0 until 3; r <- 0 until 40) yield Vec(s"g$g", vecOf(g, r))
    // three uneven micro-batches, interleaved groups — the fold order
    // the batch hash aggregate will NOT reproduce; only the exact
    // integer cells make the outputs equal anyway
    val batches = Seq(rows.take(17), rows.slice(17, 80), rows.drop(80))

    val in = MemoryStream[Vec]
    val query = StreamingMoments.moments(in.toDS(), dim)
      .writeStream.format("memory").queryName("moments_stream")
      .outputMode("update").start()
    try {
      batches.foreach { b => in.addData(b: _*); query.processAllAvailable() }

      val streamed = spark.table("moments_stream")
        .withColumn("seq", monotonically_increasing_id())
        .groupBy("grp")
        .agg(max_by(struct(col("n"), col("sx"), col("sxy")), col("seq")).as("m"))
        .select(col("grp"), col("m.n"), col("m.sx"), col("m.sxy"))
        .as[(String, Long, Seq[Double], Seq[Double])].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

      val batch = rows.toDF("grp", "vec")
        .groupBy("grp")
        .agg(Moments.matrix(col("vec").cast("array<double>"), dim).as("m"))
        .select(col("grp"), col("m.n"), col("m.sx"), col("m.sxy"))
        .as[(String, Long, Seq[Double], Seq[Double])].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

      assert(streamed.keySet == batch.keySet)
      // == on the collected doubles IS the bit-for-bit claim: both
      // sides round through the identical scale-6 HALF_UP conversion
      streamed.foreach { case (g, got) =>
        assert(got == batch(g), s"group $g diverged from the batch matrix") }
    } finally query.stop()
  }

  test("every emit is the exact running matrix, not just the final one") {
    implicit val ctx = spark.sqlContext
    val rows = (0 until 30).map(r => Vec("g", vecOf(0, r)))
    val in = MemoryStream[Vec]
    val query = StreamingMoments.moments(in.toDS(), dim)
      .writeStream.format("memory").queryName("moments_running")
      .outputMode("update").start()
    try {
      in.addData(rows.take(10): _*); query.processAllAvailable()
      in.addData(rows.drop(10): _*); query.processAllAvailable()
      val emits = spark.table("moments_running")
        .select("n", "sx").as[(Long, Seq[Double])].collect().sortBy(_._1)
      assert(emits.map(_._1).toSeq == Seq(10L, 30L))
      val prefix = rows.take(10).toDF("grp", "vec")
        .groupBy("grp")
        .agg(Moments.matrix(col("vec").cast("array<double>"), dim).as("m"))
        .select(col("m.sx")).as[Seq[Double]].head()
      assert(emits(0)._2 == prefix,
        "mid-stream emit != batch matrix over the prefix")
    } finally query.stop()
  }

  test("a wrong-length vector raises loudly") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Vec]
    val query = StreamingMoments.moments(in.toDS(), dim)
      .writeStream.format("memory").queryName("moments_bad")
      .outputMode("update").start()
    try {
      in.addData(Vec("g", Seq(1.0, 2.0)))
      val e = intercept[Exception](query.processAllAvailable())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("vector of length")))
    } finally query.stop()
  }
}
