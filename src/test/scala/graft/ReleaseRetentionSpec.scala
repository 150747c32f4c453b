package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** P13e: predicate-driven whole-partition RETENTION — archive-move
  * (never destructive), kept partitions provably untouched, archived
  * bytes reconciled against the stored rows that left. Arms: the
  * happy path with post-op re-attestation, the null partition on both
  * sides of the predicate, Hive value escaping, the missing-dir and
  * archive-collision raises, the in-place guard, and idempotent
  * re-run.
  */
class ReleaseRetentionSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // day-partitioned release (retention's natural dimension); one null
  // text pins the checksum coalesce
  private def corpus = (1L to 40L).map(i =>
      (i, s"d${i % 4}",
        if (i == 6L) null.asInstanceOf[String] else s"doc $i"))
    .toSeq.toDF("doc_id", "day", "text")

  test("age-cutoff retention: dropped partitions move to the archive " +
      "intact, kept partitions byte-untouched, verdicts all matched, " +
      "and the composed manifest re-attests the post-op release") {
    val rel = tmp("rel_ret_")
    val arc = tmp("rel_ret_arc_")
    // materialized: the spec re-reads this frame AFTER the op has
    // moved partition directories out of its lazy plan's file listing
    val stored = Release.writeAndManifest(corpus, rel, "day",
      "doc_id", "text").localCheckpoint(true)
    val rep = Release.retainAndManifest(spark, rel, arc, stored,
        col("day") < "d2", "day", "doc_id", "text")
      .collect().map(r => r.getAs[String]("day") -> r).toMap
    assert(rep.keySet == Set("d0", "d1", "d2", "d3"))
    assert(rep.values.forall(_.getAs[Boolean]("matched")))
    assert(rep("d0").getAs[Boolean]("dropped") &&
      rep("d1").getAs[Boolean]("dropped"))
    assert(!rep("d2").getAs[Boolean]("dropped") &&
      !rep("d3").getAs[Boolean]("dropped"))
    // the release now holds exactly the kept partitions...
    val left = Release.manifest(spark.read.parquet(rel), "day",
        "doc_id", "text").orderBy("day")
      .as[(String, Long, String, Long, Long)].collect().toSeq
    val keptStored = stored.filter(col("day") >= "d2").orderBy("day")
      .as[(String, Long, String, Long, Long)].collect().toSeq
    assert(left == keptStored)
    // ...and the archive holds exactly the dropped bytes
    val archived = Release.manifest(spark.read.parquet(arc), "day",
        "doc_id", "text").orderBy("day")
      .as[(String, Long, String, Long, Long)].collect().toSeq
    val dropStored = stored.filter(col("day") < "d2").orderBy("day")
      .as[(String, Long, String, Long, Long)].collect().toSeq
    assert(archived == dropStored)
  }

  test("null partition: dropped only by an explicitly-true predicate; " +
      "a NULL-valued predicate keeps it") {
    val rel = tmp("rel_ret_null_")
    val withNull = corpus.withColumn("day",
      when(col("doc_id") % 5 === 0, lit(null: String)).otherwise(col("day")))
    val stored = Release.writeAndManifest(withNull, rel, "day",
      "doc_id", "text")
    // day < 'd1' is NULL on the null partition -> kept, not dropped
    val arc1 = tmp("rel_ret_arc1_")
    val rep1 = Release.retainAndManifest(spark, rel, arc1, stored,
      col("day") < "d1", "day", "doc_id", "text").collect()
    val nullRow1 = rep1.find(_.isNullAt(0)).get
    assert(!nullRow1.getAs[Boolean]("dropped") &&
      nullRow1.getAs[Boolean]("matched"))
    assert(spark.read.parquet(rel).filter(col("day").isNull).count() == 8L)
    // isNull drops it: the Hive default-partition dir moves and
    // reconciles
    val arc2 = tmp("rel_ret_arc2_")
    val stored2 = Release.manifest(spark.read.parquet(rel), "day",
      "doc_id", "text")
    val rep2 = Release.retainAndManifest(spark, rel, arc2, stored2,
        col("day").isNull, "day", "doc_id", "text")
      .collect()
    val nullRow2 = rep2.find(_.isNullAt(0)).get
    assert(nullRow2.getAs[Boolean]("dropped") &&
      nullRow2.getAs[Boolean]("matched"))
    assert(spark.read.parquet(rel).filter(col("day").isNull).count() == 0L)
    assert(new java.io.File(s"$arc2/day=__HIVE_DEFAULT_PARTITION__").exists())
  }

  test("escaped partition values round-trip through the path encoding") {
    val rel = tmp("rel_ret_esc_")
    val arc = tmp("rel_ret_esc_arc_")
    val weird = (1L to 10L).map(i =>
        (i, if (i <= 4) "a b:c" else "plain", s"doc $i"))
      .toSeq.toDF("doc_id", "day", "text")
    val stored = Release.writeAndManifest(weird, rel, "day",
      "doc_id", "text")
    val rep = Release.retainAndManifest(spark, rel, arc, stored,
        col("day") === "a b:c", "day", "doc_id", "text")
      .collect().map(r => r.getAs[String]("day") -> r).toMap
    assert(rep("a b:c").getAs[Boolean]("dropped") &&
      rep("a b:c").getAs[Boolean]("matched"))
    assert(spark.read.parquet(arc).count() == 4L)
    assert(spark.read.parquet(rel).count() == 6L)
  }

  test("a dropped partition whose directory is missing raises; an " +
      "archive collision raises; both leave no half-applied state " +
      "behind them") {
    val rel = tmp("rel_ret_miss_")
    val arc = tmp("rel_ret_miss_arc_")
    val stored = Release.writeAndManifest(corpus, rel, "day",
        "doc_id", "text").localCheckpoint(true)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(s"$rel/day=d1"))
    val e = intercept[IllegalStateException](
      Release.retainAndManifest(spark, rel, arc, stored,
        col("day") === "d1", "day", "doc_id", "text"))
    assert(e.getMessage.contains("missing"))
    // collision: pre-occupied archive slot
    new java.io.File(s"$arc/day=d0").mkdirs()
    val e2 = intercept[IllegalStateException](
      Release.retainAndManifest(spark, rel, arc, stored,
        col("day") === "d0", "day", "doc_id", "text"))
    assert(e2.getMessage.contains("archive already contains"))
    // d0 was not moved by the failed attempts
    assert(new java.io.File(s"$rel/day=d0").exists())
  }

  test("retention refuses an archive inside the release, and a no-hit " +
      "predicate (idempotent re-run) is a trivial all-matched no-op") {
    val rel = tmp("rel_ret_guard_")
    val stored = Release.writeAndManifest(corpus, rel, "day",
      "doc_id", "text").localCheckpoint(true)
    val e = intercept[IllegalArgumentException](
      Release.retainAndManifest(spark, rel, rel + "/archive", stored,
        col("day") === "d0", "day", "doc_id", "text"))
    assert(e.getMessage.contains("new directory"))
    val arc = tmp("rel_ret_guard_arc_")
    val rep = Release.retainAndManifest(spark, rel, arc, stored,
        col("day") === "no_such_day", "day", "doc_id", "text")
      .collect()
    assert(rep.length == 4 &&
      rep.forall(r => !r.getAs[Boolean]("dropped") &&
        r.getAs[Boolean]("matched")))
    assert(spark.read.parquet(rel).count() == 40L)
  }
}
