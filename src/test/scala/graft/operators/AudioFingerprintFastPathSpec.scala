package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** r17 opt guard: the in-array PCM fingerprint fast path must equal
  * the SPI reference decode bit for bit wherever it engages, and must
  * DECLINE (fall back) on every payload class whose SPI behavior it
  * does not mirror — multi-channel block-align mismatch, non-PCM
  * format tags, truncated data chunks, non-RIFF bytes.
  */
class AudioFingerprintFastPathSpec extends AnyFunSuite {

  test("fast path equals the SPI reference on the synthesized corpus") {
    // ids cover all (rate, n_samples, slope, offset) residue classes
    for (id <- 0L until 64L) {
      val wav = Multimodal.synthesizeWav(id)
      val fast = Multimodal.audioFingerprintFast(id, wav)
      assert(fast.isDefined, s"fast path declined a plain PCM WAV id=$id")
      assert(fast.get == Multimodal.audioFingerprintGeneral(id, wav),
        s"fast/SPI fingerprint divergence for id=$id")
    }
  }

  test("fast path engages on (and matches) a stereo 16-bit PCM WAV") {
    // hand-build stereo: duplicate each synthesized mono sample into
    // two channels — block align 4, same leading-sample reads
    val mono = Multimodal.synthesizeWav(3L)
    val meta = Multimodal.audioFingerprintGeneral(3L, mono)
    assert(meta.n_samples > 0)
    val stereo = stereoOf(3L)
    val fast = Multimodal.audioFingerprintFast(3L, stereo)
    assert(fast.isDefined, "fast path declined a well-formed stereo WAV")
    assert(fast.get == Multimodal.audioFingerprintGeneral(3L, stereo),
      "fast/SPI divergence on stereo payload")
  }

  test("fast path declines truncated and malformed payloads") {
    val wav = Multimodal.synthesizeWav(5L)
    // truncated: chop the last 100 bytes so the declared data size
    // overruns the payload
    val truncated = wav.take(wav.length - 100)
    assert(Multimodal.audioFingerprintFast(5L, truncated).isEmpty,
      "fast path must decline a truncated data chunk")
    assert(Multimodal.audioFingerprintFast(5L, Array[Byte](1, 2, 3)).isEmpty)
    // non-PCM format tag: flip the fmt audioFormat field to 3 (float)
    val nonPcm = wav.clone()
    nonPcm(20) = 3 // fmt chunk starts at 12; audioFormat at offset 20
    assert(Multimodal.audioFingerprintFast(5L, nonPcm).isEmpty,
      "fast path must decline a non-PCM format tag")
  }

  private def stereoOf(id: Long): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val n = Multimodal.samplesOf(id)
    val pcm = new Array[Byte](n * 4)
    var i = 0
    while (i < n) {
      val v = Multimodal.sampleAt(id, i)
      pcm(4 * i) = (v & 0xff).toByte
      pcm(4 * i + 1) = ((v >> 8) & 0xff).toByte
      pcm(4 * i + 2) = (v & 0xff).toByte
      pcm(4 * i + 3) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(8000f, 16, 2, true, false)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("ZCR fast path equals the SPI reference and declines the same " +
      "payload classes") {
    for (id <- 0L until 48L) {
      val wav = Multimodal.synthesizeWav(id)
      val fast = Multimodal.audioZcrFast(id, wav)
      assert(fast.isDefined, s"ZCR fast path declined plain PCM id=$id")
      assert(fast.get == Multimodal.audioZcrGeneral(id, wav),
        s"ZCR fast/SPI divergence for id=$id")
    }
    val wav = Multimodal.synthesizeWav(9L)
    assert(Multimodal.audioZcrFast(9L, wav.take(wav.length - 50)).isEmpty,
      "ZCR fast path must decline a truncated data chunk")
  }
}
