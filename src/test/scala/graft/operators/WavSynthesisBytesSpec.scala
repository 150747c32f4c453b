package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** r17 opt guard: the hand-assembled WAV bytes must be BYTE-IDENTICAL
  * to the `javax.sound.sampled` writer's output for every (rate,
  * sample-count) residue class — size_bytes, magic, every decode, and
  * every oracle depend on the exact payload.
  */
class WavSynthesisBytesSpec extends AnyFunSuite {
  test("hand-assembled WAV equals the SPI writer byte for byte") {
    // rate has period 3, samples 8, slope/offset follow id too — 48
    // consecutive ids cover every header class and plenty of data
    for (id <- 0L until 48L) {
      val fast = Multimodal.synthesizeWav(id)
      val ref = Multimodal.synthesizeWavRef(id)
      assert(java.util.Arrays.equals(fast, ref),
        s"WAV byte divergence for id=$id: fast=${fast.length}B " +
          s"ref=${ref.length}B")
    }
  }
}
