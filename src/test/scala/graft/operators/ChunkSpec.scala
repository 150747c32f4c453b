package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class ChunkSpec extends SparkSuite {
  import spark.implicits._

  private def chunksOf(text: String, w: Int, s: Int) =
    Packing.chunk(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", w, s)
      .orderBy("chunk_id")
      .select("chunk_id", "token_start", "chunk_tokens")
      .as[(Long, Long, Long)].collect().toSeq

  test("short doc yields exactly one full-coverage chunk") {
    assert(chunksOf("a b c", 5, 3) == Seq((0L, 1L, 3L)))
    assert(chunksOf("a b c d e", 5, 3) == Seq((0L, 1L, 5L)))
  }

  test("stride layout: starts advance by stride, last chunk is short") {
    // 8 tokens, window 5, stride 3 -> chunks at 1..5, 4..8
    assert(chunksOf("t1 t2 t3 t4 t5 t6 t7 t8", 5, 3) ==
      Seq((0L, 1L, 5L), (1L, 4L, 5L)))
    // 9 tokens -> third chunk starts at 7, covers 3
    assert(chunksOf("t1 t2 t3 t4 t5 t6 t7 t8 t9", 5, 3) ==
      Seq((0L, 1L, 5L), (1L, 4L, 5L), (2L, 7L, 3L)))
  }

  test("non-overlapping chunking (stride == window) tiles exactly") {
    val out = chunksOf((1 to 10).map(i => s"t$i").mkString(" "), 4, 4)
    assert(out == Seq((0L, 1L, 4L), (1L, 5L, 4L), (2L, 9L, 2L)))
  }

  test("every token is covered and consecutive chunks overlap by window - stride") {
    val n = 57
    val out = chunksOf((1 to n).map(i => s"t$i").mkString(" "), 16, 11)
    assert(out.head._2 == 1L)
    assert(out.last._2 + out.last._3 - 1 == n)
    out.sliding(2).foreach {
      case Seq((_, s1, l1), (_, s2, _)) =>
        assert(s2 == s1 + 11)
        assert(s2 <= s1 + l1) // no gap
      case _ =>
    }
    // final chunk never empty
    assert(out.forall(_._3 >= 1))
  }

  test("null text yields one empty-token chunk instead of vanishing") {
    // regression: explode of a null sequence silently dropped the doc
    val out = Packing.chunk(
        Seq((1L, null.asInstanceOf[String]), (2L, "a b")).toDF("doc_id", "text"),
        "doc_id", "text", 4, 2)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == 1L) // the empty token, same as whitespace-only text
  }

  test("chunk_hash matches the slice content") {
    val out = Packing
      .chunk(Seq((1L, "aa bb cc dd ee")).toDF("doc_id", "text"),
        "doc_id", "text", 3, 2)
      .orderBy("chunk_id").select("chunk_hash").as[String].collect().toSeq
    def h(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    // n=5, w=3, s=2 -> 1 + ceil((5-3)/2) = 2 chunks; token 5 is
    // covered by the second, so no degenerate third chunk exists
    assert(out == Seq(h("aa bb cc"), h("cc dd ee")))
  }
}
