package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("extractMeta REALLY decodes: PNG and GIF metadata match the synthesis parameters") {
    val ids = (0L until 100L).toDF("doc_id")
    val got = Multimodal.extractMeta(
        Multimodal.synthesizeCorpus(ids, "doc_id"), "doc_id", "media")
      .collect().map(m => m.getAs[Long]("doc_id") -> m).toMap
    assert(got.size == 100)
    for (id <- 0L until 100L) {
      val r = got(id)
      // dimensions and frame count come from the DECODED container
      assert(r.getAs[Int]("width") == Multimodal.widthOf(id))
      assert(r.getAs[Int]("height") == Multimodal.heightOf(id))
      assert(r.getAs[Int]("n_frames") ==
        (if (id % 2 == 0) 1 else Multimodal.framesOf(id)))
      // container sniffing: PNG signature vs GIF8
      assert(r.getAs[String]("magic") ==
        (if (id % 2 == 0) "89504e47" else "47494638"))
      // the payload is a real encoded file, not a fixed-width token
      assert(r.getAs[Int]("size_bytes") > 50)
      // frame-0 pixel mean equals the closed-form row-sum mean exactly
      val h = Multimodal.heightOf(id)
      val rowSum = (0 until h).map(y => Multimodal.grayAt(id, y, 0).toLong).sum
      assert(r.getAs[Double]("mean_px") == rowSum.toDouble / h)
    }
  }

  test("decodeImage reads exact pixels out of a real PNG roundtrip") {
    val id = 37L
    val m = Multimodal.decodeImage(id, Multimodal.synthesizePng(id))
    assert(m.magic == "89504e47" && m.n_frames == 1)
    assert(m.width == Multimodal.widthOf(id) && m.height == Multimodal.heightOf(id))
  }

  test("sampleFrames decodes every GIF frame with exact per-frame stats") {
    val ids = (0L until 40L).toDF("doc_id")
    val rows = Multimodal.sampleFrames(
        Multimodal.synthesizeCorpus(ids, "doc_id", gifOnly = true),
        "doc_id", "media")
      .collect()
    // one row per real decoded frame: sum of framesOf over the ids
    assert(rows.length == (0L until 40L).map(Multimodal.framesOf).sum)
    rows.foreach { r =>
      val (id, f) = (r.getAs[Long]("doc_id"), r.getAs[Int]("frame_idx"))
      assert(f >= 0 && f < Multimodal.framesOf(id))
      // first 4 pixels down column 0, straight from the decoded raster
      val hex = (0 until 4)
        .map(y => "%02x".format(Multimodal.grayAt(id, y, f))).mkString
      assert(r.getAs[String]("frame_hex") == hex)
      val h = Multimodal.heightOf(id)
      val rowSum = (0 until h).map(y => Multimodal.grayAt(id, y, f).toLong).sum
      assert(r.getAs[Double]("frame_mean") == rowSum.toDouble / h)
    }
  }

  test("resize REALLY transforms pixels: decoded output has the target dimensions") {
    val ids = (0L until 30L).toDF("doc_id")
    val out = Multimodal.resize(
        Multimodal.synthesizeCorpus(ids, "doc_id"), "doc_id", "media",
        maxSide = 64)
      .collect()
    assert(out.length == 30)
    out.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (ow, oh) = (r.getAs[Int]("out_width"), r.getAs[Int]("out_height"))
      assert(math.max(ow, oh) <= 64)
      if (math.max(w, h) <= 64) assert(ow == w && oh == h) // no upscale
      // aspect ratio within rounding
      assert(math.abs(ow.toDouble / oh - w.toDouble / h) < 0.1 ||
        math.min(ow, oh) <= 2)
      // the resized payload is a real PNG that decodes to those dims
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("resized")))
      assert(img.getWidth == ow && img.getHeight == oh)
    }
  }

  test("extractAudioMeta REALLY decodes WAV: format and sample stats match synthesis") {
    val ids = (0L until 60L).toDF("doc_id")
    val got = Multimodal.extractAudioMeta(
        Multimodal.synthesizeAudioCorpus(ids, "doc_id"), "doc_id", "media")
      .collect().map(m => m.getAs[Long]("doc_id") -> m).toMap
    assert(got.size == 60)
    for (id <- 0L until 60L) {
      val r = got(id)
      val n = Multimodal.samplesOf(id)
      assert(r.getAs[String]("magic") == "52494646") // RIFF
      assert(r.getAs[Int]("sample_rate") == Multimodal.rateOf(id))
      assert(r.getAs[Int]("channels") == 1 && r.getAs[Int]("bits") == 16)
      assert(r.getAs[Long]("n_samples") == n.toLong)
      // canonical WAV: 44-byte header + 2 bytes per sample
      assert(r.getAs[Int]("size_bytes") == 44 + 2 * n)
      val samples = (0 until n).map(i => Multimodal.sampleAt(id, i))
      assert(r.getAs[Int]("peak") == samples.map(math.abs).max)
      val sumSq = samples.map(v => v.toLong * v).sum
      assert(r.getAs[Double]("rms") == math.sqrt(sumSq.toDouble / n))
      assert(r.getAs[Double]("duration_s") == n.toDouble / Multimodal.rateOf(id))
    }
  }

  test("extractAudioZcr guards degenerate payloads: 1-frame WAV yields rate 0, not a task failure") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    def wavOf(samples: Array[Short]): Array[Byte] = {
      val pcm = new Array[Byte](samples.length * 2)
      samples.indices.foreach { i =>
        pcm(2 * i) = (samples(i) & 0xff).toByte
        pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong),
        AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val df = Seq(
      (1L, wavOf(Array[Short](123))),          // single frame: n - 1 == 0
      (2L, wavOf(Array[Short]())),             // empty payload
      (3L, wavOf(Array[Short](5, -5, 5, -5)))) // normal: 3 crossings
      .toDF("doc_id", "media")
    val out = Multimodal.extractAudioZcr(df, "doc_id", "media")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("zero_crossings") == 0L)
    assert(out(1L).getAs[Double]("zcr") == 0.0)
    assert(out(2L).getAs[Double]("zcr") == 0.0)
    assert(out(3L).getAs[Long]("zero_crossings") == 3L)
    assert(out(3L).getAs[Double]("zcr") == 1.0)
  }

  test("PCM WAV header fast path is bit-identical to the AudioSystem decode") {
    // Differential check over every (rate, samples, slope, offset)
    // combination the synthesis produces: the header-parse fast path
    // must reproduce the general SPI decode field-for-field (incl. the
    // IEEE division/sqrt in duration/rms).
    for (id <- 0L until 48L) {
      val bytes = Multimodal.synthesizeWav(id)
      val fast = Multimodal.decodePcmWavFast(id, bytes)
      assert(fast.isDefined, s"fast path must accept the PCM contract (id=$id)")
      assert(fast.get == Multimodal.decodeAudioGeneral(id, bytes))
    }
  }

  test("non-PCM / non-WAV payloads fall off the fast path, not through it") {
    // A PNG (valid binary, wrong container) and a truncated RIFF header
    // must both return None so decodeAudio routes to the general path.
    assert(Multimodal.decodePcmWavFast(1L, Multimodal.synthesizePng(1L)).isEmpty)
    assert(Multimodal.decodePcmWavFast(1L, "RIFF".getBytes("US-ASCII")).isEmpty)
    // Float-PCM WAV (format tag 3) must be rejected by the fmt check.
    val wav = Multimodal.synthesizeWav(3L)
    val floatTag = wav.clone(); floatTag(20) = 3 // fmt chunk audioFormat lo byte
    assert(Multimodal.decodePcmWavFast(3L, floatTag).isEmpty)
  }

  test("corrupt chunk sizes terminate the RIFF walk instead of hanging it") {
    // A declared u32 chunk size >= 0x80000000 wraps negative in the Int
    // cast; sizes of -8/-9 make the word-aligned advance step 0 or
    // backwards. The walk must return None (-> general path raises
    // cleanly), never loop forever or index out of bounds.
    def withChunk(tag: String, size: Long): Array[Byte] = {
      val b = Multimodal.synthesizeWav(7L).clone()
      // First sub-chunk header lives at offset 12 (4-byte tag + LE u32 size)
      val t = tag.getBytes("US-ASCII")
      System.arraycopy(t, 0, b, 12, 4)
      b(16) = (size & 0xff).toByte
      b(17) = ((size >> 8) & 0xff).toByte
      b(18) = ((size >> 16) & 0xff).toByte
      b(19) = ((size >> 24) & 0xff).toByte
      b
    }
    // Unknown chunk + wrapped-negative size: the advance would step 0
    // (size -8) or backwards (-9, -16) — the historical infinite loop.
    for (size <- Seq(0xfffffff8L, 0xfffffff7L, 0xfffffff0L, 0xffffffffL, 0x80000000L)) {
      val out = Multimodal.decodePcmWavFast(7L, withChunk("LIST", size))
      assert(out.isEmpty, s"declared chunk size 0x${size.toHexString} must fall off the fast path")
    }
    // Huge positive size: the Int advance would wrap `off` negative and
    // index out of bounds; the Long-advance guard must return None.
    assert(Multimodal.decodePcmWavFast(7L, withChunk("fmt ", 0x7ffffff0L)).isEmpty)
    assert(Multimodal.decodePcmWavFast(7L, withChunk("LIST", 0x7ffffff0L)).isEmpty)
  }

  test("undecodable payloads fail loudly (caller owns corrupt-input policy)") {
    val rows = Seq((1L, Array[Byte](1, 2, 3))).toDF("doc_id", "media")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.extractMeta(rows, "doc_id", "media").collect()
    }
    assert(e.getMessage.contains("no ImageIO reader") ||
      e.getCause != null)
  }

  test("opaque stub keeps the video/audio contract (bytes in, typed features out)") {
    val m = Multimodal.decodeOpaqueStub(2L, Array[Byte](0x7f, 3, 9))
    assert(m.width == 64 + (0x7f % 16) * 32)
    assert(m.size_bytes == 3)
    assert(Multimodal.decodeOpaqueStub(9L, Array.empty[Byte]).mean_px == 0.0)
  }

  test("perceptual hash is container-independent: PNG == GIF frame 0 per id") {
    // the gray-raster path (PNG) and the palette-LUT path (GIF) must
    // resolve to identical pixel values — a palette mishandling would
    // flip dhash bits / histogram bins here
    for (id <- Seq(3L, 7L, 40L, 101L)) {
      val png = Multimodal.perceptualHashOf(id, Multimodal.synthesizePng(id))
      val gif = Multimodal.perceptualHashOf(id, Multimodal.synthesizeGif(id))
      assert(png == gif.copy(doc_id = png.doc_id))
    }
  }

  test("perceptual hash matches hand-computed values on a known ramp") {
    val id = 12L // w=112, h=32, slope=1+(12%7)=6, offset=12
    val p = Multimodal.perceptualHashOf(id, Multimodal.synthesizePng(id))
    assert(p.width == 112 && p.height == 32)
    def g(y: Int) = (6 * y + 12) % 256
    val expDh = (0 until 60).map { j =>
      if (g((j + 1) * 31 / 60) > g(j * 31 / 60)) 1L << j else 0L
    }.sum
    assert(p.dhash == expDh)
    val bins = (0 until 32).map(g).groupBy(_ >> 6).view.mapValues(_.size * 112L)
    assert(Seq(p.h4_0, p.h4_1, p.h4_2, p.h4_3) ==
      (0 to 3).map(b => bins.getOrElse(b, 0L)))
    // total histogram mass is the pixel count
    assert(p.h4_0 + p.h4_1 + p.h4_2 + p.h4_3 == 112L * 32L)
  }

  test("decode runs per-partition in batches (no driver collect)") {
    // 200 rows over 2 partitions with batch 64 -> the plumbing iterates
    // grouped batches; correctness of the full set implies batching
    // didn't drop or reorder rows.
    val ids = (0L until 200L).toDF("doc_id").repartition(2)
    assert(Multimodal.extractMeta(
      Multimodal.synthesizeCorpus(ids, "doc_id"), "doc_id", "media")
      .count() == 200L)
  }
}
