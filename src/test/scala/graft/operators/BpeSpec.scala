package graft.operators

import graft.SparkSuite

class BpeSpec extends SparkSuite {
  import spark.implicits._

  test("hand-computed merges, including the lexicographic tie-break") {
    // "aaab" x3, "aab" x2:
    //   iter1: (a,a) = 2*3 + 1*2 = 8 beats (a,b) = 3 + 2 = 5
    //   iter2: 'aa a b'(3) + 'aa b'(2) -> (aa,a)=3, (a,b)=3, (aa,b)=2
    //          tie 3 == 3 -> lexicographic left: "a" < "aa" -> (a,b)
    //   iter3: 'aa ab'(3) + 'aa b'(2) -> (aa,ab)=3 beats (aa,b)=2
    val df = Seq("aaab aaab aaab aab aab").toDF("text")
    val got = Bpe.train(df, "text", merges = 3)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "a", 8L), (2, "a", "b", 3L),
      (3, "aa", "ab", 3L)))
  }

  test("greedy left-to-right application: aaaa -> [aa, aa], not [aa, a, a]") {
    // iter1 counts every adjacent position: 3 x wc 2 = 6. After the
    // greedy merge 'a a a a' -> 'aa aa', the only remaining pair is
    // (aa,aa) with count 2 — [aa, a, a] would have left (aa,a)/(a,a)
    val df = Seq("aaaa aaaa").toDF("text")
    val got = Bpe.train(df, "text", merges = 2)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "a", 6L), (2, "aa", "aa", 2L)))
  }

  test("segmented vocab: symbols reassemble to the word, merges applied") {
    val df = Seq("aaab aaab aaab aab aab").toDF("text")
    val (merges, vocab) = Bpe.trainWithVocab(df, "text", merges = 3)
    val rows = vocab.orderBy("word")
      .as[(String, String, Long)].collect().toSeq
    // every word's subwords concatenate back to the word
    assert(rows.forall { case (w, syms, _) => syms.replace(" ", "") == w })
    // after (a,a), (a,b), (aa,ab): aaab -> [aaab] (iter3 fuses the
    // whole word); aab -> [aa, b]
    assert(rows == Seq(("aaab", "aaab", 3L), ("aab", "aa b", 2L)))
    assert(merges.count() == 3)
  }

  test("non-alpha tokens are excluded; merges are layout-stable") {
    val rows = (1 to 50).map(i =>
      s"hello hello99 world wo2rld hello world the${i % 7}") // mixed junk
    val a = Bpe.train(rows.toDF("text"), "text", 5)
      .collect().toSeq
    val b = Bpe.train(rows.toDF("text").repartition(7), "text", 5)
      .collect().toSeq
    assert(a == b)
    // every learned symbol derives from the two clean words
    val alphabet = "helowrd".toSet
    assert(a.forall(r => (r.getString(1) + r.getString(2))
      .forall(alphabet.contains)))
  }
}
