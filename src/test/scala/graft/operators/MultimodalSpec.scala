package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("extractMeta matches the stub decoder row-for-row") {
    val docs = (0L until 200L).map(i => (i, s"payload body $i"))
      .toDF("doc_id", "text")
      .withColumn("media", unhex(md5(col("text"))))
    val got = Multimodal.extractMeta(docs, "doc_id", "media")
      .collect().map(m => m.getAs[Long]("doc_id") -> m).toMap
    assert(got.size == 200)
    // spot-check one row against a driver-side decode of the same bytes
    val bytes = java.security.MessageDigest.getInstance("MD5")
      .digest("payload body 7".getBytes("UTF-8"))
    val expect = Multimodal.decodeStub(7L, bytes)
    val r = got(7L)
    assert(r.getAs[Int]("size_bytes") == 16)
    assert(r.getAs[String]("magic") == expect.magic)
    assert(r.getAs[Int]("width") == expect.width)
    assert(r.getAs[Int]("height") == expect.height)
    assert(r.getAs[Int]("n_frames") == expect.n_frames)
    assert(r.getAs[Double]("mean_byte") == expect.mean_byte)
  }

  test("resizeStub preserves aspect ratio and caps the long side") {
    val docs = (0L until 100L).map(i => (i, s"media $i")).toDF("doc_id", "text")
      .withColumn("media", unhex(md5(col("text"))))
    val out = Multimodal.resizeStub(docs, "doc_id", "media", maxSide = 128)
      .collect()
    assert(out.length == 100)
    out.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (ow, oh) = (r.getAs[Int]("out_width"), r.getAs[Int]("out_height"))
      assert(math.max(ow, oh) <= 128)
      if (math.max(w, h) <= 128) assert(ow == w && oh == h) // no upscale
      // aspect ratio within rounding
      assert(math.abs(ow.toDouble / oh - w.toDouble / h) < 0.1 ||
        math.min(ow, oh) <= 2)
    }
  }

  test("degenerate payloads decode safely instead of crashing tasks") {
    import spark.implicits._
    val rows = Seq(
      (1L, Array.empty[Byte]),
      (2L, Array[Byte](0x7f)),
      (3L, Array[Byte](1, 2)))
      .toDF("doc_id", "media")
    val out = Multimodal.extractMeta(rows, "doc_id", "media")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size == 3)
    assert(out(1L).getAs[Int]("size_bytes") == 0)
    assert(out(1L).getAs[Double]("mean_byte") == 0.0)
    assert(out(2L).getAs[Int]("width") == 64 + (0x7f % 16) * 32)
  }

  test("decode runs per-partition in batches (no driver collect)") {
    // 200 rows over 2 partitions with batch 64 -> the plumbing iterates
    // grouped batches; correctness of the full set implies batching
    // didn't drop or reorder rows.
    val docs = (0L until 200L).map(i => (i, s"x$i")).toDF("doc_id", "text")
      .withColumn("media", unhex(md5(col("text"))))
      .repartition(2)
    assert(Multimodal.extractMeta(docs, "doc_id", "media").count() == 200L)
  }
}
