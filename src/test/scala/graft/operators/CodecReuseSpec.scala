package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** r17 opt guard for the thread-local ImageIO codec pool: a REUSED
  * writer must emit byte-identical payloads to a fresh instance (48
  * sequential encodes through one thread — any cross-image state leak
  * shows up as a byte diff), and a REUSED reader must decode an
  * interleaved PNG/GIF stream identically regardless of order or
  * repetition (any retained-input state shows up as a field diff).
  */
class CodecReuseSpec extends AnyFunSuite {

  test("pooled PNG/GIF writers emit byte-identical payloads to fresh " +
      "instances across sequential reuse") {
    for (id <- 0L until 48L) {
      val fast = Multimodal.mediaFor(id) // pooled writers, reused
      val ref =
        if (id % 2 == 0) Multimodal.synthesizePngRef(id)
        else Multimodal.synthesizeGifRef(id)
      assert(java.util.Arrays.equals(fast, ref),
        s"payload byte divergence for id=$id (fast=${fast.length}B " +
          s"ref=${ref.length}B)")
    }
  }

  test("pooled readers decode an interleaved stream identically in any " +
      "order") {
    val ids = (0L until 32L)
    val payloads = ids.map(id => id -> Multimodal.mediaFor(id))
    val fwdMeta = payloads.map { case (id, b) => Multimodal.decodeImage(id, b) }
    val revMeta = payloads.reverse
      .map { case (id, b) => Multimodal.decodeImage(id, b) }.reverse
    assert(fwdMeta == revMeta, "decodeImage depends on decode order")
    val fwdHash = payloads.map { case (id, b) =>
      Multimodal.perceptualHashOf(id, b) }
    val revHash = payloads.reverse
      .map { case (id, b) => Multimodal.perceptualHashOf(id, b) }.reverse
    assert(fwdHash == revHash, "perceptualHashOf depends on decode order")
  }
}
