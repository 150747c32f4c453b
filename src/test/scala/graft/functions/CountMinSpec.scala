package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class CountMinSpec extends SparkSuite {
  import spark.implicits._

  private val depth = 4
  private val width = 64

  test("estimates never undercount and are exact without collisions") {
    val items = (1 to 300).flatMap(i => Seq.fill(i % 7 + 1)(s"it${i % 5}"))
    val df = items.toDF("item").repartition(5)
    val sk = df.agg(CountMin.sketch(col("item"), depth, width).as("sk"))
    val got = df.distinct()
      .crossJoin(broadcast(sk))
      .select(col("item"),
        CountMin.estimate(col("sk"), col("item"), depth, width).as("est"))
      .as[(String, Long)].collect().toMap
    val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // 5 distinct items into 4x64 counters: overcount requires a
    // same-row collision among 5 items — check the structural lower
    // bound always, and the CMS error bound with n=total, eps=e/width
    val n = items.size
    exact.foreach { case (k, c) =>
      assert(got(k) >= c, s"$k undercounted: ${got(k)} < $c")
      assert(got(k) <= c + math.ceil(math.E * n / width).toLong,
        s"$k above the CMS bound: ${got(k)} vs $c + e*$n/$width")
    }
  }

  test("the grid is mergeable: partition layout never changes it") {
    val items = (1 to 500).map(i => s"k${i % 17}")
    def grid(parts: Int) =
      items.toDF("item").repartition(parts)
        .agg(CountMin.sketch(col("item"), depth, width))
        .as[Seq[Seq[Long]]].head()
    assert(grid(1) == grid(7))
  }

  test("every grid row carries the full mass; unknown items read small") {
    val items = (1 to 200).map(i => s"k${i % 3}")
    val sk = items.toDF("item")
      .agg(CountMin.sketch(col("item"), depth, width).as("sk"))
    val rows = sk.as[Seq[Seq[Long]]].head()
    assert(rows.length == depth)
    assert(rows.forall(_.length == width))
    assert(rows.forall(_.sum == 200L)) // each row is a full projection
    // an item never inserted can only read collision mass
    val ghost = sk.select(
      CountMin.estimate(col("sk"), lit("never-seen"), depth, width))
      .as[Long].head()
    assert(ghost <= 200L / 3 + 1,
      s"ghost estimate $ghost should be far below the hot count")
  }

  test("SQL surface: graft_cms / graft_cms_estimate round-trip") {
    (1 to 90).map(i => s"t${i % 2}").toDF("item")
      .createOrReplaceTempView("__cms_probe")
    val est = spark.sql(
      s"""SELECT graft_cms_estimate(
         |  graft_cms(item, $depth, $width), 't1', $depth, $width) AS e
         |FROM __cms_probe""".stripMargin)
      .as[Long].head()
    assert(est == 45L)
  }
}
