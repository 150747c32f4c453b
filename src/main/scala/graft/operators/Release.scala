package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** P13: release writer with a content-addressed manifest — the
  * shipping step after curation: write the corpus partitioned by its
  * release dimension with bounded file sizes, then prove the written
  * artifact IS the corpus. The manifest row per partition carries an
  * order-independent content checksum, so "did the write lose,
  * duplicate, or mangle anything" is one frame comparison — the same
  * question the snapshot diff (P7) answers between corpus versions,
  * asked here between a corpus and its serialized form.
  *
  * Checksum: Σ md5₆₀(id | text) per partition, summed in
  * decimal(38,0) — exact and ORDER-INDEPENDENT (file/task order is
  * not deterministic in a distributed write, so an order-sensitive
  * digest would be useless), emitted as a STRING (the only dtype a
  * 38-digit integer survives in every engine/reader unchanged).
  * Collision scope: a corruption must collide a 60-bit-hash SUM to
  * slip through — fine for integrity (not an adversarial MAC).
  *
  * Scale shape: the write is Spark's own partitioned parquet write
  * (`maxRecordsPerFile` bounds task output files); the manifest is
  * one map-side-combinable aggregation per side, output bounded by
  * the partition vocabulary.
  */
object Release {

  private val cleanupRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Register `dir` for recursive deletion at JVM exit (idempotent per
    * path). Eager post-build deletion is impossible for the gate's
    * scratch artifact — the returned manifest frame reads it LAZILY at
    * execution time — so the hook bounds disk accumulation at one
    * scratch copy per LIVE JVM instead of one per historical run (the
    * per-application path already keeps concurrent runs disjoint).
    */
  def deleteOnExit(dir: String): Unit =
    if (cleanupRegistered.add(dir))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm))
          f.delete(); ()
        }
        rm(new java.io.File(dir))
      }))

  /** Order-independent per-partition manifest of any frame. */
  def manifest(df: DataFrame, partitionCol: String, idCol: String,
      textCol: String): DataFrame =
    df.groupBy(col(partitionCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(Hashing.md5Long60(concat(col(idCol).cast("string"), lit("|"),
          coalesce(col(textCol), lit("")))).cast("decimal(38,0)"))
          .cast("string").as("content_sum"),
        min(col(idCol)).as("min_id"),
        max(col(idCol)).as("max_id"))

  /** Write `df` partitioned by `partitionCol` under `dir`, read the
    * artifact back, and return ITS manifest — gating the full
    * write→read roundtrip, not the in-memory frame.
    */
  def writeAndManifest(df: DataFrame, dir: String, partitionCol: String,
      idCol: String, textCol: String,
      maxRecordsPerFile: Long = 1000000L): DataFrame = {
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(dir)
    manifest(df.sparkSession.read.parquet(dir), partitionCol, idCol, textCol)
  }
}
