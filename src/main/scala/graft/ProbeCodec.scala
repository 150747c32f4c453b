package graft
import graft.operators.Multimodal

/** One-off codec micro-benchmark: where does the image synthesis/
  * decode time actually go (SPI lookup vs encode vs decode)?
  */
object ProbeCodec {
  def main(args: Array[String]): Unit = {
    val n = 2000
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[codec] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
    }
    // warm-up
    (0L until 200L).foreach(id => Multimodal.mediaFor(id))
    time("png encode (even ids)") {
      var i = 0L; while (i < n) { Multimodal.synthesizePng(i); i += 2 }
    }
    time("gif encode (odd ids)") {
      var i = 1L; while (i < n) { Multimodal.synthesizeGif(i); i += 2 }
    }
    val payloads = (0L until n).map(id => id -> Multimodal.mediaFor(id))
    time("extractMeta decode") {
      payloads.foreach { case (id, b) => Multimodal.decodeImage(id, b) }
    }
    time("perceptualHash decode") {
      payloads.foreach { case (id, b) => Multimodal.perceptualHashOf(id, b) }
    }
    val wavs = (0L until n).map(id => id -> Multimodal.synthesizeWav(id))
    time("wav synth (fast)") {
      (0L until n).foreach(id => Multimodal.synthesizeWav(id))
    }
    time("audio fingerprint (fast)") {
      wavs.foreach { case (id, b) => Multimodal.audioFingerprintOf(id, b) }
    }
  }
}
