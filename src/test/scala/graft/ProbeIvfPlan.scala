package graft
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 adjudication evidence for the ANN-family drift
  * (VERDICT_r13 "What's wrong" #2): r13's `nearestCell` returned a
  * Column, inlining the O(nlist x dim) distance array into BOTH
  * argmin operands. Two measurements:
  *
  *  1. PLAN: count `graft_dot` references in the optimized plan of
  *     the cell assignment — the inline form carries 2x nlist dots
  *     (the array is duplicated), the named-column `withCell` form
  *     carries nlist (materialized once; CollapseProject declines to
  *     inline a non-cheap expression referenced twice).
  *  2. SCALE: wall-clock of both forms at 2M vectors x 32 cells x
  *     16 dims — the corpus-assignment regime where the doubled
  *     compute actually bites (at the sf0.1 gate's 2,000 vectors the
  *     drift was dominated by the doubled codegen/compile overhead,
  *     not the arithmetic).
  */
object ProbeIvfPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{IvfIndex, Similarity}

    def gen(nRows: Long): DataFrame =
      spark.range(nRows).select(col("id").as("vec_id"),
        expr("transform(sequence(1, 16), j -> CAST((abs(xxhash64(concat(id, '_', j))) % 2000 - 1000) AS DOUBLE) / 1000.0)")
          .as("embedding"))

    // the r13 inline form, reconstructed verbatim for the comparison
    def inlineCell(v: Column, nrm2: Column, cents: Array[Array[Double]]): Column = {
      val ds = array(cents.map { c =>
        val lc = array(c.map(lit).toIndexedSeq: _*)
        val c2 = c.foldLeft(0.0)((acc, x) => acc + x * x)
        nrm2 - lit(2.0) * Similarity.dotD(v, lc) + lit(c2)
      }.toIndexedSeq: _*)
      (array_position(ds, array_min(ds)) - 1).cast("int")
    }

    // --- 1. plan shape at nlist=8 (readable dump) ---
    val small = gen(1000)
    val idx = IvfIndex.buildDeterministic(small, "vec_id", "embedding", 8)
    def dots(plan: String): Int = "graft_dot".r.findAllIn(plan).length
    println(s"[ivfplan] withCell optimized-plan graft_dot count (8 cells + 1 norm): " +
      dots(idx.cells.queryExecution.optimizedPlan.toString))
    val nSmall = Similarity.withNorm(small, "vec_id", "embedding")
    val inlined = nSmall.withColumn("cell",
      inlineCell(col("v"), col("nrm2"), idx.centroids))
    println(s"[ivfplan] r13 inline optimized-plan graft_dot count: " +
      dots(inlined.queryExecution.optimizedPlan.toString))

    // --- 2. wall-clock at 8M x 32 cells, both arms warmed untimed
    // first and reps interleaved so JIT warmth cancels ---
    val big = Similarity.withNorm(gen(8000000), "vec_id", "embedding")
      .localCheckpoint(eager = true)
    val cents = big.orderBy(col("vec_id")).limit(32).select(col("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    val arms: Seq[(String, DataFrame)] = Seq(
      ("withCell (named column)", IvfIndex.withCell(big, cents)),
      ("r13 inline Column", big.withColumn("cell",
        inlineCell(col("v"), col("nrm2"), cents))))
    arms.foreach { case (_, df) => df.selectExpr("sum(cell)").collect() }
    val ts = (1 to 5).flatMap { _ =>
      arms.map { case (name, df) =>
        val t0 = System.nanoTime()
        df.selectExpr("sum(cell)").collect()
        (name, (System.nanoTime() - t0) / 1e9) } }
    arms.foreach { case (name, _) =>
      val a = ts.collect { case (`name`, t) => t }
      println(f"[ivfplan] $name median ${a.sorted.apply(2)}%.2f s (${a.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
