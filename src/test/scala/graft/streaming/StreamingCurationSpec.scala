package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.operators.Sampling

final case class MixDoc(doc_id: Long, source: String)

class StreamingCurationSpec extends SparkSuite {
  import spark.implicits._

  private val shares = Seq("a" -> 0.5, "b" -> 0.3)
  private val rows = (0L until 300L).map(i => MixDoc(i, s"${('a' + (i % 3).toInt).toChar}"))

  test("streaming mix filter equals batch mixSample under the same profile") {
    implicit val ctx = spark.sqlContext
    val batch = rows.toDF()
    val profile = Sampling.mixProfile(batch, "source", shares, 0.2, 0.5)

    val in = MemoryStream[MixDoc]
    val query = StreamingCuration.mixFilter(in.toDF(), "doc_id", "source", profile)
      .writeStream.format("memory").queryName("mix_stream").outputMode("append")
      .start()
    try {
      in.addData(rows.take(150): _*)
      in.addData(rows.drop(150): _*)
      query.processAllAvailable()

      val streamed = spark.table("mix_stream")
        .select("doc_id").as[Long].collect().toSet
      val batched = Sampling.mixSample(batch, "doc_id", "source", shares, 0.2, 0.5)
        .select("doc_id").as[Long].collect().toSet
      assert(streamed == batched && batched.nonEmpty)
    } finally query.stop()
  }

  test("streaming mix filter equals batch temperatureMix under the same profile") {
    implicit val ctx = spark.sqlContext
    // skewed corpus so the sqrt flattening actually changes thresholds
    val skewed = (0L until 640L).map(i => MixDoc(i, "big")) ++
      (640L until 680L).map(i => MixDoc(i, "small"))
    val batch = skewed.toDF()
    val profile = Sampling.temperatureMixProfile(batch, "source", 0.3)

    val in = MemoryStream[MixDoc]
    val query = StreamingCuration
      .mixFilter(in.toDF(), "doc_id", "source", profile, salt = "tmix")
      .writeStream.format("memory").queryName("tmix_stream").outputMode("append")
      .start()
    try {
      in.addData(skewed.take(100): _*)
      in.addData(skewed.drop(100): _*)
      query.processAllAvailable()
      val streamed = spark.table("tmix_stream")
        .select("doc_id").as[Long].collect().toSet
      val batched = Sampling.temperatureMix(batch, "doc_id", "source", 0.3)
        .select("doc_id").as[Long].collect().toSet
      assert(streamed == batched && batched.nonEmpty)
    } finally query.stop()
  }

  test("token-window chunking applies to a stream verbatim (row-local op)") {
    implicit val ctx = spark.sqlContext
    val docs = Seq(
      MixDoc(1L, "unused"), MixDoc(2L, "unused")) // ids only; text below
    val texts = Map(1L -> (1 to 9).map(i => s"t$i").mkString(" "),
      2L -> "short doc")
    val in = MemoryStream[MixDoc]
    val withText = graft.operators.Packing.chunk(
      in.toDF().withColumn("text",
        org.apache.spark.sql.functions.element_at(
          org.apache.spark.sql.functions.map(
            docs.flatMap(d => Seq(
              org.apache.spark.sql.functions.lit(d.doc_id),
              org.apache.spark.sql.functions.lit(texts(d.doc_id)))): _*),
          org.apache.spark.sql.functions.col("doc_id"))),
      "doc_id", "text", 5, 3)
    val query = withText.writeStream.format("memory")
      .queryName("chunk_stream").outputMode("append").start()
    try {
      in.addData(docs: _*)
      query.processAllAvailable()
      val streamed = spark.table("chunk_stream")
        .select("doc_id", "chunk_id", "token_start", "chunk_tokens")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(streamed == Set(
        (1L, 0L, 1L, 5L), (1L, 1L, 4L, 5L), (1L, 2L, 7L, 3L),
        (2L, 0L, 1L, 2L)))
    } finally query.stop()
  }

  test("hashSplit and stratifiedSample apply to a stream verbatim (row-local ops)") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[MixDoc]
    val query = Sampling.stratifiedSample(
        Sampling.hashSplit(in.toDF(), "doc_id", 80, 10),
        "source", "doc_id", 500)
      .writeStream.format("memory").queryName("split_stream").outputMode("append")
      .start()
    try {
      in.addData(rows: _*)
      query.processAllAvailable()
      val streamed = spark.table("split_stream")
        .select("doc_id", "split").as[(Long, String)].collect().toSet
      val batched = Sampling.stratifiedSample(
          Sampling.hashSplit(rows.toDF(), "doc_id", 80, 10),
          "source", "doc_id", 500)
        .select("doc_id", "split").as[(Long, String)].collect().toSet
      assert(streamed == batched && batched.nonEmpty)
    } finally query.stop()
  }

  test("sources missing from the profile follow defaultThr") {
    implicit val ctx = spark.sqlContext
    val profile = Seq(("a", 1000000L)).toDF("__src", "__thr")

    val in = MemoryStream[MixDoc]
    val query = StreamingCuration
      .mixFilter(in.toDF(), "doc_id", "source", profile, defaultThr = 0L)
      .writeStream.format("memory").queryName("mix_default").outputMode("append")
      .start()
    try {
      in.addData(MixDoc(1L, "a"), MixDoc(2L, "zzz"), MixDoc(3L, "a"))
      query.processAllAvailable()
      val got = spark.table("mix_default").select("doc_id").as[Long].collect().toSet
      // thr=1000000 keeps every 'a' row; the unknown source drops at thr=0
      assert(got == Set(1L, 3L))
    } finally query.stop()
  }
}
