package graft.queries

import graft.SparkSuite
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** A10/A11: the gated queries carry (exact column, banded self-check
  * boolean) so the DuckDB oracle can check them exactly; this spec (a)
  * pins the gated booleans TRUE, and (b) keeps the RAW sketch-value
  * tolerance assertions the projection no longer exposes, computed
  * inline from the same aggregations.
  */
class SketchSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("gated sketch rows: every self-check band holds") {
    val d = AnalyticsQueries.qSketchDistinct(spark, dir).collect()
    assert(d.nonEmpty)
    d.foreach(r => assert(r.getAs[Boolean]("approx_ok"),
      s"distinct band violated for ${r.getAs[String]("event_type")}"))
    val q = AnalyticsQueries.qSketchQuantile(spark, dir).collect()
    assert(q.nonEmpty)
    q.foreach(r => assert(r.getAs[Boolean]("approx_ok"),
      s"quantile band violated for ${r.getAs[String]("event_type")}"))
  }

  test("HLL++ distinct within 5% of exact (raw values)") {
    val e = Tables.load(spark, dir, "events")
    val rows = e.groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
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
  test("quantile sketch: p50 within 5%, p99 inside its envelope (raw values)") {
    val rows = Tables.load(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        expr("approx_percentile(value, array(0.5, 0.99), 1000)").as("ap"),
        expr("percentile(value, 0.5)").as("exact_p50"),
        max(col("value")).as("max_value"))
      .select(col("event_type"),
        col("ap")(0).as("approx_p50"), col("ap")(1).as("approx_p99"),
        col("exact_p50"), col("max_value"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p50 = r.getAs[Double]("approx_p50")
      val p99 = r.getAs[Double]("approx_p99")
      val exact50 = r.getAs[Double]("exact_p50")
      val mx = r.getAs[Double]("max_value")
      assert(math.abs(p50 - exact50) <= math.abs(exact50) * 0.05 + 1e-9,
        s"p50 approx=$p50 exact=$exact50")
      assert(p99 >= p50 && p99 <= mx, s"p99 approx=$p99 outside [p50, max=$mx]")
    }
  }
}
