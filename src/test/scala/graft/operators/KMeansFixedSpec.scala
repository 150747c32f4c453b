package graft.operators

import graft.SparkSuite

class KMeansFixedSpec extends SparkSuite {
  import spark.implicits._

  /** The same fixed-point Lloyd fit in driver-side Long arithmetic. */
  private def refFit(vecs: Seq[(Long, Seq[Double])], k: Int, iters: Int,
      offset: Double = 1.0): (Array[Array[Long]], Map[Long, Int]) = {
    val quant = vecs.map { case (id, v) =>
      id -> v.map(x => math.floor((x + offset) * 1000000.0).toLong).toArray
    }.sortBy(_._1)
    var cs = quant.take(k).map(_._2.clone()).toArray
    def nearest(m: Array[Long]): Int =
      cs.zipWithIndex.map { case (c, i) =>
        (m.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, i)
      }.min._2
    for (_ <- 1 to iters) {
      val groups = quant.groupBy { case (_, m) => nearest(m) }
      cs = cs.zipWithIndex.map { case (old, cell) =>
        groups.get(cell) match {
          case Some(members) =>
            val d = old.length
            Array.tabulate(d)(j =>
              members.map(_._2(j)).sum / members.size)
          case None => old
        }
      }
    }
    (cs, quant.map { case (id, m) => id -> nearest(m) }.toMap)
  }

  private val data: Seq[(Long, Seq[Double])] = {
    // three planted blobs in 4-d + a stray point
    def blob(base: Double, ids: Range) =
      ids.map(i => (i.toLong,
        Seq(base + (i % 3) * 0.001, base - (i % 5) * 0.002,
          base + 0.01, base - 0.01)))
    blob(0.0, 0 to 9) ++ blob(0.4, 10 to 19) ++ blob(-0.4, 20 to 29) :+
      (30L, Seq(0.9, 0.9, 0.9, 0.9))
  }

  test("matches the driver-side Long reference: centroids and inertia") {
    val df = data.toDF("vec_id", "embedding")
    val model = KMeansFixed.fit(df, "vec_id", "embedding", k = 4, iters = 3)
    val (refCs, refAsg) = refFit(data, k = 4, iters = 3)
    assert(model.centroids.map(_.toSeq).toSeq == refCs.map(_.toSeq).toSeq)
    val gotAsg = model.assigned.select("id", "cell")
      .as[(Long, Long)].collect().toMap
    assert(gotAsg == refAsg.map { case (k2, v) => k2 -> v.toLong })
    // summary n sums to the corpus, inertia is the exact member sum
    val sm = KMeansFixed.summary(model)
      .select("cell", "n", "dim", "centroid_micro", "inertia")
      .as[(Long, Long, Long, Long, Long)].collect()
    val perCell = sm.groupBy(_._1).map { case (c, rows) =>
      c -> (rows.head._2, rows.head._5) }
    assert(perCell.values.map(_._1).sum == data.size)
    val refInertia = data.groupBy { case (id, _) => refAsg(id) }
      .map { case (cell, members) =>
        cell.toLong -> members.map { case (_, v) =>
          val m = v.map(x => math.floor((x + 1.0) * 1000000.0).toLong)
          m.zip(refCs(cell)).map { case (a, b) =>
            (a - b) * (a - b) }.sum
        }.sum
      }
    refInertia.foreach { case (cell, want) =>
      assert(perCell(cell)._2 == want, s"cell $cell inertia") }
  }

  test("iters=0 returns the seeding verbatim") {
    val df = data.toDF("vec_id", "embedding")
    val model = KMeansFixed.fit(df, "vec_id", "embedding", k = 3, iters = 0)
    val want = data.sortBy(_._1).take(3).map(_._2.map(x =>
      math.floor((x + 1.0) * 1000000.0).toLong).toSeq)
    assert(model.centroids.map(_.toSeq).toSeq == want)
  }

  test("result is invariant under repartitioning (order-free fit)") {
    val df = data.toDF("vec_id", "embedding")
    val a = KMeansFixed.fit(df, "vec_id", "embedding", 4, 2)
    val b = KMeansFixed.fit(df.repartition(7), "vec_id", "embedding", 4, 2)
    assert(a.centroids.map(_.toSeq).toSeq == b.centroids.map(_.toSeq).toSeq)
  }

  test("empty cells keep their previous centroid and report n=0") {
    // two identical far blobs seeded with 3 centroids: one seed never
    // wins a member after the first update
    val pts = (0L to 5L).map(i => (i, Seq(0.0, 0.0))) ++
      (6L to 11L).map(i => (i, Seq(0.5, 0.5)))
    val model = KMeansFixed.fit(pts.toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 3, iters = 2)
    val sm = KMeansFixed.summary(model)
      .select("cell", "n").as[(Long, Long)].collect().distinct.toMap
    assert(sm.size == 3)
    assert(sm.values.sum == pts.size)
  }

  test("negative coordinate after offset raises") {
    val bad = Seq((1L, Seq(-2.5, 0.0)), (2L, Seq(0.1, 0.2)))
    val e = intercept[Exception] {
      KMeansFixed.fit(bad.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 1, iters = 1)
    }
    assert(e.getMessage.contains("negative coordinate") ||
      Option(e.getCause).exists(_.getMessage.contains("negative coordinate")))
  }
}
