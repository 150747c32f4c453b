package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe: argmin-cell via array_min vs array_sort-head over
  * (d, cell) structs, 400k x nlist=128 — decides the corpus-side
  * assignment idiom. Run: sbt "Test/runMain graft.ProbeArgmin"
  */
object ProbeArgmin {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity
    def gen(base: String) = expr(
      s"transform(sequence(1, 16), j -> CAST((abs(xxhash64(concat($base, '_', j))) % 2000 - 1000) AS DOUBLE) / 1000.0)")
    val c = spark.range(400000).select(col("id").as("vec_id"), gen("id").as("embedding"))
    val n = Similarity.withNorm(c, "vec_id", "embedding")
      .localCheckpoint(eager = true)
    val cents = n.orderBy(col("vec_id")).limit(128).select(col("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    val dists = array(cents.zipWithIndex.map { case (cc, i) =>
      struct((col("nrm2") - lit(2.0) * Similarity.dotD(col("v"),
          array(cc.map(lit).toIndexedSeq: _*)) + lit(cc.map(x => x * x).sum)).as("d"),
        lit(i).as("cell"))
    }.toIndexedSeq: _*)
    def time(name: String)(f: org.apache.spark.sql.DataFrame): Unit = {
      val rs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.selectExpr("sum(cell)").collect()
        (System.nanoTime() - t0) / 1e9 }
      println(f"[argmin] $name median ${rs.sorted.apply(1)}%.2f s (${rs.map(t => f"$t%.2f").mkString(", ")})")
    }
    val distsD = array(cents.map { cc =>
      col("nrm2") - lit(2.0) * Similarity.dotD(col("v"),
        array(cc.map(lit).toIndexedSeq: _*)) + lit(cc.map(x => x * x).sum)
    }.toIndexedSeq: _*)
    time("array_min")(n.withColumn("cell", array_min(dists)("cell")))
    time("array_sort_head")(n.withColumn("__d", dists)
      .withColumn("cell", expr("element_at(array_sort(__d), 1).cell")))
    time("position_of_min_doubles")(n.withColumn("__d", distsD)
      .withColumn("cell", expr("array_position(__d, array_min(__d)) - 1")))
    time("array_sort_head_again")(n.withColumn("__d", dists)
      .withColumn("cell", expr("element_at(array_sort(__d), 1).cell")))
    spark.stop()
  }
}
