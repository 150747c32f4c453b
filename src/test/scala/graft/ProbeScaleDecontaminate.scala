package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-slope probe for the decontamination family (C8 n-gram scrub,
  * C9 semantic scrub): the claim is cost LINEAR in the train corpus
  * with a FIXED eval set — C8 is one semi-join of train grams against
  * the (small) eval gram set plus a doc-keyed window over hit docs
  * only; C9 never shuffles the train corpus at all (zero-shuffle
  * nprobe routing + broadcast eval cells + train-keyed agg). Doubling
  * train size should double wall-clock; the eval side stays constant.
  *
  * Corpus: 1% of train docs carry an eval passage (C8) / an exact
  * eval vector copy (C9), so the planted-contamination count is known
  * and the probe asserts recall on the planted rows, not just speed.
  * Run: sbt -batch "Test/runMain graft.ProbeScaleDecontaminate"
  */
object ProbeScaleDecontaminate {
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

    // ---- C8: n-gram scrub. eval = 1000 passage docs (10 tokens each);
    // train doc i = 15 unique + (1% of docs) eval passage + 15 unique.
    val evalDocs = spark.range(1000).select(col("id").as("doc_id"),
      expr("concat_ws(' ', transform(sequence(1, 10), j -> concat('e', id, '_', j)))")
        .as("text")).localCheckpoint(eager = true)
    def train(n: Long) = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ",
        expr("concat_ws(' ', transform(sequence(1, 15), j -> concat('u', id, '_', j)))"),
        expr("CASE WHEN id % 100 = 0 THEN concat_ws(' ', transform(sequence(1, 10), j -> concat('e', id % 1000, '_', j))) ELSE concat('m', id) END"),
        expr("concat_ws(' ', transform(sequence(16, 30), j -> concat('u', id, '_', j)))"))
        .as("text"))
    for (n <- Seq(200000L, 400000L, 800000L)) {
      val t = train(n).localCheckpoint(eager = true)
      val planted = n / 100
      time(s"C8 scrubContamination train=$n eval=1000 (planted=$planted)") {
        val out = graft.operators.Dedup
          .scrubContamination(t, evalDocs, "doc_id", "text", 5, 8)
        val c = out.count()
        assert(c == planted, s"expected $planted affected docs, got $c")
        c
      }
      t.unpersist()
    }

    // ---- C9: semantic scrub. eval = 5000 deterministic 16-dim
    // vectors (xxhash64 per (base, dim) — genuinely spread, no LCG
    // lattice collisions); train doc i%100==0 is an EXACT copy of
    // eval (i%5000) (same vector -> same nearest centroid ->
    // guaranteed cell hit).
    def gen(base: String) = expr(
      s"transform(sequence(1, 16), j -> CAST((abs(xxhash64(concat($base, '_', j))) % 2000 - 1000) AS DOUBLE) / 1000.0)")
    val evalVecs = spark.range(5000).select(col("id").as("vec_id"),
      gen("id").as("embedding")).localCheckpoint(eager = true)
    def trainVecs(n: Long) = spark.range(n).select(col("id").as("vec_id"),
      expr("CASE WHEN id % 100 = 0 THEN id % 5000 ELSE 1000000 + id END").as("__b"))
      .select(col("vec_id"), gen("__b").as("embedding"))
    for (n <- Seq(100000L, 200000L, 400000L)) {
      val t = trainVecs(n).localCheckpoint(eager = true)
      val planted = n / 100
      time(s"C9 scrubSemantic train=$n eval=5000 nlist=64 (planted=$planted)") {
        val out = graft.operators.SemDedup
          .scrubSemantic(t, evalVecs, "vec_id", "embedding",
            nlist = 64, tau = 0.999, nprobe = 2)
          .filter(col("status") === "contaminated")
        val c = out.count()
        assert(c >= planted, s"expected >= $planted contaminated, got $c")
        c
      }
      t.unpersist()
    }
    spark.stop()
  }
}
