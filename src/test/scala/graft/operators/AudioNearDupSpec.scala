package graft.operators

import graft.SparkSuite

/** M8 -> D4 composition: the acoustic energy-delta fingerprint through
  * the banded Hamming machinery — the audio leg of the near-dup triad
  * (text SimHash D4, image dHash M7, audio M8). Pins:
  *
  *   1. the REAL PCM decode equals the pure closed-form ramp kernel
  *      bit for bit (the oracle's legitimacy);
  *   2. identical-ramp payloads pair at Hamming 0 end to end;
  *   3. banded pairs == brute force over real corpus fingerprints
  *      when nBands > maxHamming (pigeonhole exactness);
  *   4. a tampered payload (one window muted) pairs with its original
  *      at exactly the Hamming distance the kernel predicts — the
  *      planted-pair arm from REAL bytes, not synthetic hashes.
  */
class AudioNearDupSpec extends SparkSuite {
  import spark.implicits._

  /** The pure fingerprint kernel over a sample array — 61 windows,
    * exact Long energies, sign-of-delta bits. */
  private def pureFp(samples: Array[Int]): Long = {
    val n = samples.length
    val energy = new Array[Long](61)
    var i = 0
    while (i < n) {
      val v = samples(i).toLong
      energy(((i.toLong * 61L) / n).toInt) += v * v
      i += 1
    }
    (0 until 60).foldLeft(0L)((fp, j) =>
      if (energy(j + 1) > energy(j)) fp | (1L << j) else fp)
  }

  private def ramp(id: Long): Array[Int] =
    Array.tabulate(Multimodal.samplesOf(id))(i => Multimodal.sampleAt(id, i))

  test("fingerprint from REAL decoded PCM equals the closed-form ramp " +
      "kernel bit for bit") {
    for (id <- Seq(0L, 1L, 7L, 63L, 255L, 1791L, 40413L)) {
      val got = Multimodal.audioFingerprintOf(id, Multimodal.synthesizeWav(id))
      assert(got.n_samples == Multimodal.samplesOf(id).toLong)
      assert(got.afp == pureFp(ramp(id)),
        s"decode/kernel divergence for id=$id")
    }
  }

  test("audioNearDup finds identical-ramp payloads at Hamming 0 from " +
      "REAL decode") {
    // synthesis params are (id%7, id%256, id%8)-periodic: ids equal
    // mod lcm = 1792 encode byte-identical WAVs, hence fingerprints
    // 0 apart
    val ids = Seq(5L, 5L + 1792L, 11L).toDF("doc_id")
    val out = Multimodal.audioNearDup(
        Multimodal.synthesizeAudioCorpus(ids, "doc_id"), "doc_id", "media",
        maxHamming = 0, nBands = 3)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("hamming")))
    assert(out.toSeq == Seq((5L, 5L + 1792L, 0L)))
  }

  test("banded pairs == brute force over the real corpus fingerprints " +
      "(pigeonhole, nBands > maxHamming)") {
    val ids = (0L until 200L).toDF("doc_id")
    val corpus = Multimodal.synthesizeAudioCorpus(ids, "doc_id")
    val fps = Multimodal.audioFingerprint(corpus, "doc_id", "media")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("afp"))
      .toMap
    val brute = (for {
      a <- fps.keys.toSeq.sorted; b <- fps.keys.toSeq.sorted if a < b
      d = java.lang.Long.bitCount(fps(a) ^ fps(b)).toLong if d <= 2
    } yield (a, b, d)).toSet
    val banded = Multimodal.audioNearDup(corpus, "doc_id", "media",
        maxHamming = 2, nBands = 3)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("hamming")))
      .toSet
    assert(banded == brute)
  }

  test("a payload with one window muted pairs with its original at " +
      "exactly the kernel-predicted distance (planted pair, real bytes)") {
    val id = 17L
    val wav = Multimodal.synthesizeWav(id)
    val n = Multimodal.samplesOf(id)
    def mutedSamples(w: Long): Array[Int] = {
      val m = ramp(id)
      for (i <- 0 until n if (i.toLong * 61L) / n == w) m(i) = 0
      m
    }
    // first window whose muting provably moves the fingerprint (muting
    // only re-orders the two adjacent energy comparisons, so the
    // distance is 1 or 2 — inside the pair gate by construction)
    val w = (1L to 59L).find(w =>
      pureFp(mutedSamples(w)) != pureFp(ramp(id))).get
    val muted = mutedSamples(w)
    // mute the SAME window in the bytes the decoder sees
    val tampered = wav.clone()
    for (i <- 0 until n if (i.toLong * 61L) / n == w) {
      tampered(44 + 2 * i) = 0
      tampered(44 + 2 * i + 1) = 0
    }
    val expected = java.lang.Long.bitCount(pureFp(ramp(id)) ^ pureFp(muted))
    assert(expected >= 1 && expected <= 2) // only bits w-1/w can move
    val df = Seq((1L, wav), (2L, tampered)).toDF("doc_id", "media")
    val out = Multimodal.audioNearDup(df, "doc_id", "media",
        maxHamming = 2, nBands = 3)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("hamming")))
    assert(out.toSeq == Seq((1L, 2L, expected.toLong)))
  }
}
