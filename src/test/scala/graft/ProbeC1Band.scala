package graft
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession

/** Round-17 probe closing VERDICT_r16 #4: re-pin the C1 contamination
  * premium band. The two r16 pairings read q_contamination at
  * 4.3x/4.8x against the adjudicated 3.0-3.6x band — but Spark's
  * absolute side was stable (1.25-1.61 s) and the move was entirely
  * the DuckDB denominator (0.26-0.37 s vs ~0.45 before), i.e. the
  * documented denominator-variance class, not a Spark regression. Per
  * the §26.1 discipline a band is only re-pinned from an ISOLATED
  * INTERLEAVED measurement, so this probe is the Spark half of a
  * strict S1,D1,S2,D2,… alternation with the DuckDB oracle driven by
  * `scripts/probe_c1_band.py` (file-handshake turn-taking — the two
  * engines cannot share a JVM, interleaving within one quiet box
  * window is what kills the drift-between-arm-blocks failure mode
  * that produced false conclusions twice, r13/r14).
  *
  * Queries: q_contamination (the disputed band), q_contamination_by
  * (same guard-cost family), q_token_count (the stable-history
  * control). n=5 per arm, medians to SURVEY §32.
  */
object ProbeC1Band {
  val Queries = Seq("q_token_count", "q_contamination", "q_contamination_by")
  private val TurnFile = Paths.get("/tmp/c1_turn")
  private val OutFile = Paths.get("/tmp/c1_spark.jsonl")

  private def waitFor(turn: String): Unit = {
    while (!Files.exists(TurnFile) ||
        new String(Files.readAllBytes(TurnFile)).trim != turn)
      Thread.sleep(200)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def noop(name: String): Unit =
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    // same warm-up as Bench.scala: JVM/codegen/parquet-reader spin-up
    spark.range(1000000).selectExpr("sum(id * 2)")
      .write.format("noop").mode("overwrite").save()
    graft.sources.Tables.all.foreach { t =>
      try spark.read.parquet(s"$dir/$t.parquet").schema
      catch { case _: Throwable => () }
    }
    Files.deleteIfExists(OutFile)
    Files.createFile(OutFile)
    for (rep <- 1 to 5) {
      waitFor(s"spark-$rep")
      for (q <- Queries) {
        val t0 = System.nanoTime()
        noop(q)
        val sec = (System.nanoTime() - t0) / 1e9
        Files.write(OutFile,
          f"""{"rep": $rep, "query": "$q", "sec": $sec%.3f}%n""".getBytes,
          StandardOpenOption.APPEND)
        println(f"[probe] rep $rep $q%-20s $sec%6.2f s")
      }
      Files.write(TurnFile, s"duck-$rep".getBytes)
    }
    spark.stop()
  }
}
