package graft.queries

import graft.SparkSuite

class SketchSpec extends SparkSuite {

  test("HLL++ distinct within 5% of exact") {
    val rows = AnalyticsQueries.qSketchDistinct(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getAs[String]("event_type")}: approx=$approx exact=$exact")
    }
  }

  // p50 is stable at ~200 rows/group; p99 sits between adjacent order
  // statistics that can differ by tens of percent at that size, so it
  // only gets an envelope check (>= p50 sketch, <= group max).
  test("quantile sketch: p50 within 5%, p99 inside its envelope") {
    val rows = AnalyticsQueries.qSketchQuantile(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = Seq(r.getAs[Double]("approx_p50"), r.getAs[Double]("approx_p99"))
      val exact = Seq(r.getAs[Double]("exact_p50"), r.getAs[Double]("exact_p99"))
      val mx = r.getAs[Double]("max_value")
      assert(math.abs(approx(0) - exact(0)) <= math.abs(exact(0)) * 0.05 + 1e-9,
        s"p50 approx=${approx(0)} exact=${exact(0)}")
      assert(approx(1) >= approx(0) && approx(1) <= mx,
        s"p99 approx=${approx(1)} outside [p50, max=$mx]")
    }
  }
}
