package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch profiling main (dev tooling — test scope so it stays out
  * of the library jar; run via `sbt "Test/runMain graft.Probe"`). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-36s median ${ts.sorted.apply(1)}%.2f s  (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    noop(spark.range(1000000).selectExpr("sum(id*2)"))

    val d0 = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    val docs = d0.union(d0.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val h30 = graft.functions.Hashing.h30 _
    import graft.operators.Dedup

    // --- simhash: current vs checkpointed bands
    time("simhash current")(
      noop(Dedup.simhashNearDup(docs, "doc_id", "text", 3, maxBucket = 100L)))
    def simhashCkpt(): org.apache.spark.sql.DataFrame = {
      val sims = Dedup.simhashes(docs, "doc_id", "text")
      val bandStructs = (0 until 3).map { j =>
        struct(lit(j).as("band"),
          shiftright(col("simhash"), 10 * j).bitwiseAND(lit(1023L)).as("bv"))
      }
      val all = sims
        .select(col("doc_id"), col("simhash"), explode(array(bandStructs: _*)).as("b"))
        .select(col("doc_id"), col("simhash"), col("b.band").as("band"), col("b.bv").as("bv"))
      val bands = all
        .withColumn("__w", count(lit(1)).over(Window.partitionBy(col("band"), col("bv"))))
        .filter(col("__w") <= 100L).drop("__w")
        .localCheckpoint()
      bands.as("x").join(bands.as("y"), Seq("band", "bv"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          expr("bit_count(x.simhash ^ y.simhash)").cast("long").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
    }
    time("simhash ckpt(bands)")(noop(simhashCkpt()))

    // --- dup passages: current (structure check before any change)
    time("dupPassages current")(
      noop(Dedup.dupPassages(d0, "doc_id", "text", 5, 2, h30)))

    // --- incremental: current
    val idStr = col("doc_id").cast("string")
    val incoming = d0.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
      .union(d0.filter(col("doc_id") % 10 === 1)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          concat(col("text"), lit(" zzappended")).as("text")))
      .union(d0.filter(col("doc_id") % 10 === 2)
        .select((col("doc_id") + 4000000L).as("doc_id"),
          concat(lit("qqa"), idStr, lit(" qqb"), idStr,
            lit(" qqc"), idStr, lit(" qqd"), idStr).as("text")))
    time("incremental current")(
      noop(Dedup.incremental(d0, incoming, "doc_id", "text", 3, 1, 2, h30)))

    // --- dupPassages with checkpointed grams (+ base variant)
    def dupPassCkpt(ckptBase: Boolean): org.apache.spark.sql.DataFrame = {
      val n = 5
      val combine = (0 until n)
        .map(k => s"${Dedup.ShingleCoef(k)}L * element_at(th, i + ${k + 1})")
        .mkString(" + ")
      val base0 = d0
        .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= n)
        .withColumn("th", transform(col("toks"), t => h30(t)))
      val base = if (ckptBase) base0.localCheckpoint() else base0
      val grams = base
        .select(col("doc_id"),
          posexplode(expr(s"transform(sequence(0, size(th) - $n), i -> $combine)"))
            .as(Seq("pos0", "sh")))
        .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("sh"))
        .localCheckpoint()
      val dupSh = grams.groupBy(col("sh"))
        .agg(countDistinct(col("doc_id")).as("__d"))
        .filter(col("__d") >= 2).select("sh")
      val covered = grams.join(dupSh, Seq("sh"), "left_semi")
        .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + (n - 1))).as("tp"))
        .distinct()
      val w = Window.partitionBy(col("doc_id")).orderBy(col("tp"))
      val spans = covered
        .withColumn("__new",
          when(lag(col("tp"), 1).over(w).isNull ||
            col("tp") > lag(col("tp"), 1).over(w) + 1, 1L).otherwise(0L))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("dup_tokens"), sum(col("__new")).as("n_spans"),
          collect_list(col("tp")).as("__cov"))
      spans.join(base, "doc_id")
        .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
          col("dup_tokens"), col("n_spans"),
          round(col("dup_tokens") / size(col("toks")), 4).as("dup_frac"),
          md5(concat_ws(" ", transform(
            array_except(sequence(lit(1), size(col("toks"))), col("__cov")),
            p => element_at(col("toks"), p)))).as("keep_hash"))
    }
    time("dupPassages ckpt(grams)")(noop(dupPassCkpt(false)))
    time("dupPassages ckpt(grams+base)")(noop(dupPassCkpt(true)))

    // --- incremental with checkpointed shingle sets both sides
    def incCkpt(): org.apache.spark.sql.DataFrame = {
      // replicate Dedup.incremental with localCheckpoint on both sets
      val ex = d0.select(col("doc_id"), col("text"))
      val inc = incoming.select(col("doc_id"), col("text"))
      val exHash = ex.groupBy(md5(col("text")).as("__h"))
        .agg(min(col("doc_id")).as("exact_match"))
      val exact = inc.withColumn("__h", md5(col("text")))
        .join(exHash, Seq("__h"), "left")
        .select(col("doc_id"), col("exact_match"))
      val exSets = Dedup.shingleSets(ex, "doc_id", "text", 3, h30).localCheckpoint()
      val incSets = Dedup.shingleSets(inc, "doc_id", "text", 3, h30).localCheckpoint()
      val exBands = Dedup.bandHashes(Dedup.minhashSignatures(exSets))
      val incBands = Dedup.bandHashes(Dedup.minhashSignatures(incSets))
      val cand = incBands.as("x").join(exBands.as("y"), Seq("band", "bh"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      val shared = cand
        .join(incSets.select(col("doc_id").as("doc_a"), col("sh")), "doc_a")
        .join(exSets.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("shared"))
      val near = shared
        .join(incSets.groupBy(col("doc_id").as("doc_a"))
          .agg(count(lit(1)).as("n_a")), "doc_a")
        .join(exSets.groupBy(col("doc_id").as("doc_b"))
          .agg(count(lit(1)).as("n_b")), "doc_b")
        .filter(lit(3L) * col("shared") >= lit(1L) * (col("n_a") + col("n_b")))
        .groupBy(col("doc_a").as("doc_id"))
        .agg(min(col("doc_b")).as("near_match"))
      exact.join(near, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("exact_match").isNotNull, "dup_exact")
            .when(col("near_match").isNotNull, "near_dup")
            .otherwise("new").as("status"),
          coalesce(col("exact_match"), col("near_match")).as("match_id"))
    }
    time("incremental ckpt(sets)")(noop(incCkpt()))

    spark.stop()
  }
}
