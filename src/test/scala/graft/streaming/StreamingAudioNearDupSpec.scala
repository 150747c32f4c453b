package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Multimodal

final case class AudioRow(doc_id: Long, media: Array[Byte])

/** M8s: the M7s serving contract with the audio kernel — streamed
  * pairs equal brute-force stream x corpus on REAL decoded WAVs, and
  * the plan carries zero streaming state.
  */
class StreamingAudioNearDupSpec extends SparkSuite {
  import spark.implicits._

  // audio synthesis params are (id%7, id%256, id%8)-periodic: id and
  // id + 1792 encode byte-identical WAVs (fingerprint distance 0)
  private val corpusIds = Seq(5L, 9L, 14L, 27L, 40L)
  private val streamIds = Seq(5L + 1792L, 9L + 1792L, 700L)

  private def mediaOf(ids: Seq[Long]): Seq[AudioRow] =
    ids.map(id => AudioRow(id, Multimodal.synthesizeWav(id)))

  private def fpOf(ids: Seq[Long]): Map[Long, Long] =
    ids.map(id =>
      id -> Multimodal.audioFingerprintOf(id, Multimodal.synthesizeWav(id)).afp).toMap

  private def brute(t: Int): Set[(Long, Long, Long)] = {
    val lh = fpOf(streamIds)
    val rh = fpOf(corpusIds)
    (for {
      l <- streamIds; r <- corpusIds
      d = java.lang.Long.bitCount(lh(l) ^ rh(r)).toLong
      if d <= t
    } yield (l, r, d)).toSet
  }

  test("streamed pair set equals brute-force stream x corpus " +
      "(pigeonhole exact) and finds the planted identical clips") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[AudioRow]
    val df = StreamingAudioNearDup.matchAgainst(in.toDF(),
      mediaOf(corpusIds).toDF(), "doc_id", "media", maxHamming = 2,
      nBands = 3)
    val query = df.writeStream.format("memory").queryName("aud_stream")
      .outputMode("append").start()
    try {
      in.addData(mediaOf(streamIds): _*)
      query.processAllAvailable()
      val got = spark.table("aud_stream").collect()
        .map(r => (r.getAs[Long]("left_id"), r.getAs[Long]("right_id"),
          r.getAs[Long]("hamming"))).toSet
      assert(got == brute(2))
      assert(got.contains((5L + 1792L, 5L, 0L)))
      assert(got.contains((9L + 1792L, 9L, 0L)))
    } finally query.stop()
  }

  test("append mode, zero streaming state: plan has no stateful operator") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[AudioRow]
    val df = StreamingAudioNearDup.matchAgainst(in.toDF(),
      mediaOf(corpusIds).toDF(), "doc_id", "media")
    val query = df.writeStream.format("memory").queryName("aud_stateless")
      .outputMode("append").start()
    try {
      in.addData(mediaOf(streamIds): _*)
      query.processAllAvailable()
      val progress = query.lastProgress
      assert(progress.stateOperators.isEmpty ||
        progress.stateOperators.forall(_.numRowsTotal == 0))
    } finally query.stop()
  }
}
