package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins the r18 native cell-assignment kernel
  * (graft.functions.NearestCell, used by IvfIndex.withCell) to the SQL
  * form it replaced: `array_position(ds, array_min(ds)) - 1` over
  * ds_i = (nrm2 - 2.0 * dot(v, c_i)) + |c_i|^2 — including exact-tie
  * rows (duplicate centroids) where both forms must keep the FIRST
  * minimum, and the null-vector raise contract.
  */
class NearestCellSpec extends SparkSuite {
  import spark.implicits._

  private val dim = 8

  private def sqlCell(n: org.apache.spark.sql.DataFrame,
      centroids: Array[Array[Double]]): org.apache.spark.sql.DataFrame = {
    def litArray(xs: Array[Double]) = array(xs.toIndexedSeq.map(lit): _*)
    def dist(c: Array[Double]) = {
      val c2 = c.foldLeft(0.0)((acc, x) => acc + x * x)
      col("nrm2") - lit(2.0) * Similarity.dotD(col("v"), litArray(c)) + lit(c2)
    }
    n.withColumn("__ds", array(centroids.map(dist).toIndexedSeq: _*))
      .withColumn("__pos", array_position(col("__ds"), array_min(col("__ds"))))
      .withColumn("cell_sql", (col("__pos") - 1).cast("int"))
      .drop("__ds", "__pos")
  }

  test("kernel cell == SQL-form cell on random vectors, including " +
      "duplicate-centroid exact ties") {
    val rng = new scala.util.Random(11)
    val vecs = (0L until 200L).map(i =>
      (i, Seq.fill(dim)((rng.nextDouble() * 2 - 1).toFloat)))
      .toDF("vec_id", "embedding")
    val n = Similarity.withNorm(vecs, "vec_id", "embedding")
    val base = (0 until 6).map(_ =>
      Array.fill(dim)(rng.nextDouble() * 2 - 1)).toArray
    // centroid 3 duplicates centroid 1 bit-for-bit: every vector whose
    // argmin is centroid 1 is an exact tie with 3 — first index wins
    val centroids = base.updated(3, base(1).clone())
    val out = sqlCell(IvfIndex.withCell(n, centroids), centroids)
      .select("vec_id", "cell", "cell_sql").collect()
    assert(out.length == 200)
    out.foreach { r =>
      assert(r.getInt(1) == r.getInt(2),
        s"vec ${r.getLong(0)}: kernel ${r.getInt(1)} != sql ${r.getInt(2)}")
    }
    // the planted tie actually fires (some vector lands on centroid 1)
    assert(out.exists(_.getInt(1) == 1))
    assert(!out.exists(_.getInt(1) == 3), "tie must resolve to the first index")
  }

  test("null vector raises (never a silent null cell)") {
    val df = Seq((1L, Seq(0.5f, 0.25f)), (2L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding")
    val n = Similarity.withNorm(df, "vec_id", "embedding")
    val e = intercept[Exception] {
      IvfIndex.withCell(n, Array(Array(0.1, 0.2), Array(0.3, 0.4)))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("no nearest cell")), s"got: $e")
  }
}
