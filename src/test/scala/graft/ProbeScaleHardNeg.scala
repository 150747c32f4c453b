package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-slope probe for hard-negative mining (G1): the claim is that
  * per-query cost tracks Σ probed-cell sizes, so growing `nlist` with
  * the corpus (cells stay ~constant-sized) keeps search cost ~FLAT
  * while a fixed `nlist` grows linearly (cells fatten with the
  * corpus). Both arms are measured on the same corpora.
  *
  * 1% of corpus vectors are EXACT copies of a query vector under a
  * DIFFERENT label (same vector -> same cell -> guaranteed candidate),
  * so every query must surface a cos = 1.0 negative at rank 1 — the
  * probe asserts retrieval of every plant, not just speed.
  * Run: sbt -batch "Test/runMain graft.ProbeScaleHardNeg"
  */
object ProbeScaleHardNeg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val rs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val r = f
        ((System.nanoTime() - t0) / 1e9, r) }
      println(f"[probe] $name median ${rs.map(_._1).sorted.apply(1)}%.2f s " +
        f"(${rs.map(t => f"${t._1}%.2f").mkString(", ")}) rows=${rs.head._2}")
    }

    // deterministic 16-dim vectors; labels 0..3; plants: vec i%100==0
    // copies query (i%16)'s vector under label (query_label+1)%4
    def gen(base: String) = expr(
      s"transform(sequence(1, 16), j -> CAST((abs(xxhash64(concat($base, '_', j))) % 2000 - 1000) AS DOUBLE) / 1000.0)")
    // plant target cycles through ALL 16 queries: (id div 100) % 16,
    // not id % 16 (100 ≡ 4 mod 16 would only ever hit {0,4,8,12})
    def corpus(n: Long) = spark.range(n).select(col("id").as("vec_id"),
      expr("CASE WHEN id >= 16 AND id % 100 = 0 THEN (id DIV 100) % 16 ELSE id END").as("__b"),
      expr("CASE WHEN id >= 16 AND id % 100 = 0 THEN CAST(((id DIV 100) % 16 + 1) % 4 AS INT) " +
        "ELSE CAST(id % 4 AS INT) END").as("label"))
      .select(col("vec_id"), gen("__b").as("embedding"), col("label"))

    for (n <- Seq(100000L, 200000L, 400000L)) {
      val c = corpus(n).localCheckpoint(eager = true)
      val q = c.filter(col("vec_id") < 16).localCheckpoint(eager = true)
      // scaled arm: nlist ∝ √n (the IVF convention — cell size and
      // cell count grow together), so 64 / 91 / 128 across the sizes
      val scaled = (64 * math.sqrt(n / 100000.0)).round.toInt
      for ((nlist, arm) <- Seq(64 -> "fixed nlist=64",
          scaled -> s"scaled nlist=$scaled")) {
        time(s"G1 mine corpus=$n $arm") {
          val out = graft.operators.HardNegatives
            .mine(c, q, "vec_id", "embedding", "label",
              k = 5, nlist = nlist, nprobe = 4)
            .localCheckpoint(eager = true)
          val rank1 = out.filter(col("rnk") === 1)
          val perfect = rank1.filter(col("cos") === 1.0).count()
          assert(perfect == 16L,
            s"expected all 16 queries to surface a planted cos=1.0 negative at rank 1, got $perfect")
          out.count()
        }
      }
      c.unpersist(); q.unpersist()
    }
    spark.stop()
  }
}
