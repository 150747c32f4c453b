package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SkewSpec extends SparkSuite {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 90% of facts hit key 1
    val facts = ((1 to 900).map(i => (1L, i.toDouble)) ++
      (1 to 100).map(i => (1L + i % 7, i.toDouble)))
      .toDF("k", "x")
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"),
      (5L, "d"), (6L, "e"), (7L, "f"))
      .toDF("k", "name")
    val salted = Skew.saltedJoin(facts, dim, "k", salt = 8)
    val plain = facts.join(dim, "k")
    assert(salted.count() == plain.count())
    assert(salted.groupBy("name").count().collect().map(r =>
        r.getString(0) -> r.getLong(1)).toMap ==
      plain.groupBy("name").count().collect().map(r =>
        r.getString(0) -> r.getLong(1)).toMap)
  }
}

class IvfIndexSpec extends SparkSuite {

  test("IVF search has high recall vs brute force and perfect self-recall") {
    val dir = "/root/testdata/sf0.001"
    val vecs = graft.sources.Tables.load(spark, dir, "embeddings")
    val queries = vecs.filter(col("vec_id") < 10)
    val index = IvfIndex.build(vecs, "vec_id", "embedding", nlist = 8)
    assert(index.centroids.length == 8)

    val ivf = IvfIndex.search(index, queries, "vec_id", "embedding",
      k = 5, nprobe = 4)
    val brute = Similarity.bruteTopK(vecs, queries, "vec_id", "embedding", 5)
    def asSets(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .groupBy(_.getAs[Long]("query_id"))
        .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val iv = asSets(ivf)
    val br = asSets(brute)
    val recall = br.keys.toSeq.map { q =>
      iv.getOrElse(q, Set.empty).intersect(br(q)).size.toDouble / br(q).size
    }.sum / br.size
    // uniform random vectors are adversarial for IVF; with half the
    // cells probed recall should still be well above chance
    assert(recall >= 0.5, s"recall=$recall")
  }

  test("null vector fails assignment LOUDLY instead of vanishing from cell joins") {
    val sq = spark
    import sq.implicits._
    val good = Seq((1L, Array(1.0, 0.0)), (2L, Array(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val bad = good.unionAll(
      Seq((3L, null.asInstanceOf[Array[Double]])).toDF("vec_id", "embedding"))
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    // clean corpus assigns fine
    assert(IvfIndex.assign(cents, good, "vec_id", "embedding").count() == 2)
    // a null vector has no nearest cell: raise, never a silent NULL
    // cell that drops the row from downstream equi-joins
    val e = intercept[Exception](
      IvfIndex.assign(cents, bad, "vec_id", "embedding").collect())
    assert(e.getMessage != null && (e.getMessage.contains("no nearest cell")
      || (e.getCause != null &&
        e.getCause.getMessage.contains("no nearest cell"))),
      s"unexpected failure: ${e.getMessage}")
  }
}

class IvfPersistenceSpec extends SparkSuite {

  test("saved index reloads and searches identically") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS ivf_cells")
    val wh = new java.io.File("/tmp/graft-warehouse/ivf_cells")
    if (wh.exists()) { wh.listFiles().foreach(_.delete()); wh.delete() }

    val vecs = graft.sources.Tables.load(spark, dir, "embeddings")
    val queries = vecs.filter(org.apache.spark.sql.functions.col("vec_id") < 5)
    val index = IvfIndex.build(vecs, "vec_id", "embedding", nlist = 8)
    IvfIndex.save(index, spark, "ivf_cells", "/tmp/graft-ivf-centroids.json")
    val loaded = IvfIndex.load(spark, "ivf_cells", "/tmp/graft-ivf-centroids.json")
    assert(loaded.centroids.length == 8)

    def rows(ix: IvfIndex.Index) =
      IvfIndex.search(ix, queries, "vec_id", "embedding", k = 5, nprobe = 4)
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk"),
          r.getAs[Long]("neighbor_id"))).toSet
    assert(rows(loaded) == rows(index) && rows(index).nonEmpty)
  }
}

class ReferenceConfigSpec extends SparkSuite {

  test("reference config JSON maps onto BaselineConfig") {
    val json = """{
      "clickhouse_host": "127.0.0.1",
      "calculaton_period": 86400,
      "aggregation_function": "max",
      "generate_incoming_packet_threshold": true,
      "incoming_packet_expression": "value * 2",
      "generate_incoming_bit_threshold": true,
      "incoming_bit_expression": "value * 3",
      "generate_incoming_flow_threshold": false,
      "incoming_flow_expression": "value + 200"
    }"""
    val rc = ReferenceConfig.fromJson(json)
    assert(rc.calculationPeriod == 86400L)
    assert(rc.aggregationFunction == "max")
    assert(rc.rules.map(_.outName) == Seq("threshold_pps", "threshold_mbps"))
    assert(rc.rules.find(_.outName == "threshold_mbps").get.divisor == 1048576L)
    val cfg = rc.toBaselineConfig("host", "ts",
      Map("packets_incoming" -> org.apache.spark.sql.functions.col("value")))
    assert(cfg.windowSeconds == 86400L)
    assert(cfg.aggregationFunction == "max")
  }

  test("defaults match the reference (7-day window, avg)") {
    val rc = ReferenceConfig.fromJson("{}")
    assert(rc.calculationPeriod == 604800L)
    assert(rc.aggregationFunction == "avg")
    assert(rc.rules.size == 3)
  }
}
