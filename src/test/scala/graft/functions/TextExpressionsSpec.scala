package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** LowerRoot: the locale-pinned fold behind TextAnalysis.normalize and
  * readability — a pure function of the input bytes regardless of the
  * JVM default locale (the tr_TR gate-sweep lesson).
  */
class TextExpressionsSpec extends SparkSuite {
  import spark.implicits._

  private def fold(ss: String*): Seq[String] =
    ss.toSeq.toDF("s")
      .select(TextExpressions.lowerRoot(col("s")).as("l"))
      .as[String].collect().toSeq

  test("ASCII folds byte-wise; mixed strings fold under Locale.ROOT") {
    assert(fold("NOISY Block END", "MiXeD 123") ==
      Seq("noisy block end", "mixed 123"))
    // the q_normalize fixture shape: non-ASCII dash forces the slow
    // path, the ASCII 'I' must still fold to plain 'i', never 'ı'
    assert(fold("—NOISY I") == Seq("—noisy i"))
    assert(fold("ÉCOLE Straße") == Seq("école straße"))
  }

  test("kernel is locale-independent even with the JVM default forced " +
      "to tr_TR for the call") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      // direct kernel call (codegen emits exactly this static call)
      val out = CaseKernels.lowerRoot(
        org.apache.spark.unsafe.types.UTF8String.fromString("—NOISY I"))
      assert(out.toString == "—noisy i") // tr would give ı
    } finally java.util.Locale.setDefault(prev)
  }

  test("nulls pass through; empty string folds to itself") {
    val r = Seq[(java.lang.Long, String)]((1L, null), (2L, ""))
      .toDF("id", "s")
      .select(TextExpressions.lowerRoot(col("s")).as("l"))
      .collect()
    assert(r(0).isNullAt(0) && r(1).getString(0) == "")
  }
}
