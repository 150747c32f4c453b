package graft.operators

import graft.SparkSuite

class QuantizationSpec extends SparkSuite {
  import spark.implicits._

  test("int8 report: scale, saturation, and bounded error") {
    val vecs = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(127.0f, -127.0f, 63.5f, 1.0f)))
      .toDF("vec_id", "embedding")
    val m = Quantization.int8Report(vecs, "vec_id", "embedding")
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap

    // vec 1: amax=1 -> scale=1/127; codes 127,-64,32,0 (one saturated)
    assert(m(1L).getAs[Long]("dim") == 4L)
    assert(m(1L).getAs[Long]("n_sat") == 1L)
    assert(m(1L).getAs[Double]("scale") == math.rint(1.0 / 127.0 * 1e6) / 1e6)
    // max error of symmetric int8 quant is scale/2
    assert(m(1L).getAs[Double]("max_abs_err") <= 1.0 / 127.0 / 2.0 + 1e-6)

    // zero vector: nothing to quantize
    assert(m(2L).getAs[Double]("scale") == 0.0)
    assert(m(2L).getAs[Long]("n_sat") == 0L)
    assert(m(2L).getAs[Double]("max_abs_err") == 0.0)

    // vec 3: both extremes saturate exactly
    assert(m(3L).getAs[Long]("n_sat") == 2L)
    assert(m(3L).getAs[Double]("scale") == 1.0)
    assert(m(3L).getAs[Double]("max_abs_err") == 0.5) // 63.5 rounds to 64
  }

  test("quantization error never exceeds scale/2 on real embeddings") {
    val e = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // scale and max_abs_err are display-rounded to 1e-6, so the exact
    // scale/2 bound carries up to ~7.5e-7 of rounding slack
    val bad = Quantization.int8Report(e, "vec_id", "embedding")
      .filter(org.apache.spark.sql.functions.expr(
        "max_abs_err > scale / 2 + 1e-6 AND scale > 0"))
    assert(bad.isEmpty)
  }
}
