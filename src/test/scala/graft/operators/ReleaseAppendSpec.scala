package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** P13c: manifest-reconciled incremental append — the checksum's
  * order-independent SUM gives append an algebraic expectation
  * (before + batch = after), verified per partition without
  * re-scanning the old release's data.
  */
class ReleaseAppendSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def base = (1L to 20L).map(i =>
      (i, if (i <= 12) "a" else "b", s"base doc $i")).toSeq
    .toDF("doc_id", "source", "text")

  // batch extends partition a, creates partition c, includes a null
  // text and a duplicate id (multiset-append semantics)
  private def batch = Seq(
      (101L, "a", "new doc 101"),
      (102L, "a", null.asInstanceOf[String]),
      (5L, "a", "base doc 5"), // duplicate id+content: still reconciles
      (201L, "c", "first doc of a new partition"))
    .toSeq.toDF("doc_id", "source", "text")

  test("append reconciles: before + batch = after per partition, " +
      "including a brand-new partition and duplicate ids") {
    val dir = tmp("rel_app_")
    Release.writeAndManifest(base, dir, "source", "doc_id", "text",
      maxRecordsPerFile = 5L).collect()
    val rep = Release.appendAndManifest(batch, dir, "source",
        "doc_id", "text", maxRecordsPerFile = 5L)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(rep.keySet == Set("a", "b", "c"))
    assert(rep.values.forall(_.getAs[Boolean]("matched")))
    assert(rep("a").getAs[Long]("n_rows_after") == 15L) // 12 + 3
    assert(rep("b").getAs[Long]("n_rows_after") == 8L)  // untouched
    assert(rep("c").getAs[Long]("n_rows_after") == 1L)  // created
    // the artifact's manifest now equals the direct manifest of the
    // logical union — the append lost and invented nothing
    val direct = Release.manifest(base.union(batch),
      "source", "doc_id", "text").orderBy("source")
      .as[(String, Long, String, Long, Long)].collect().toSeq
    val artifact = Release.manifest(spark.read.parquet(dir),
      "source", "doc_id", "text").orderBy("source")
      .as[(String, Long, String, Long, Long)].collect().toSeq
    assert(artifact == direct)
  }

  test("two appends of the same batch both reconcile (multiset add, " +
      "dedup is upstream's job)") {
    val dir = tmp("rel_app2_")
    Release.writeAndManifest(base, dir, "source", "doc_id", "text").collect()
    val r1 = Release.appendAndManifest(batch, dir, "source", "doc_id", "text")
      .collect()
    val r2 = Release.appendAndManifest(batch, dir, "source", "doc_id", "text")
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(r1.forall(_.getAs[Boolean]("matched")))
    assert(r2.values.forall(_.getAs[Boolean]("matched")))
    assert(r2("a").getAs[Long]("n_rows_after") == 18L) // 12 + 3 + 3
  }

  test("appendIncremental: the O(batch) chain — each call's output is " +
      "the next call's stored manifest, always equal to a full re-scan") {
    val dir = tmp("rel_inc_")
    val m0 = Release.writeAndManifest(base, dir, "source", "doc_id", "text",
      maxRecordsPerFile = 5L)
    val m1 = Release.appendIncremental(batch, dir, m0, "source",
      "doc_id", "text", maxRecordsPerFile = 5L)
    assert(m1.collect().forall(_.getAs[Boolean]("matched")))
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("source", "n_rows", "content_sum", "min_id", "max_id")
        .as[(String, Long, String, Long, Long)].collect().toSet
    // the composed manifest IS the artifact's full-scan manifest
    assert(asSet(m1) == asSet(Release.manifest(spark.read.parquet(dir),
      "source", "doc_id", "text")))
    // chain a second batch off m1 — still O(batch), still exact
    val batch2 = Seq((301L, "b", "late doc"), (302L, "d", "another new "
      + "partition")).toDF("doc_id", "source", "text")
    val m2 = Release.appendIncremental(batch2, dir, m1, "source",
      "doc_id", "text")
    assert(m2.collect().forall(_.getAs[Boolean]("matched")))
    assert(asSet(m2) == asSet(Release.manifest(spark.read.parquet(dir),
      "source", "doc_id", "text")))
    assert(asSet(m2).map(_._1) == Set("a", "b", "c", "d"))
  }

  test("appendIncremental: a NULL partition value appends and " +
      "reconciles (null-safe three-way join)") {
    val dir = tmp("rel_inc_null_")
    val baseN = base.withColumn("source",
      when(col("doc_id") <= 4, lit(null: String)).otherwise(col("source")))
    val m0 = Release.writeAndManifest(baseN, dir, "source", "doc_id", "text")
    val batchN = Seq((401L, null.asInstanceOf[String], "null-source doc"),
      (402L, "a", "normal doc")).toDF("doc_id", "source", "text")
    val m1 = Release.appendIncremental(batchN, dir, m0, "source",
      "doc_id", "text")
    val rows = m1.collect()
    assert(rows.forall(_.getAs[Boolean]("matched")))
    val nullRow = rows.find(_.isNullAt(rows.head.fieldIndex("source"))).get
    assert(nullRow.getAs[Long]("n_rows") == 5L) // 4 base + 1 batch
    // composed manifest still equals the full re-scan, null row included
    val audit = Release.manifest(spark.read.parquet(dir),
      "source", "doc_id", "text")
    assert(m1.select("source", "n_rows", "content_sum")
        .as[(Option[String], Long, String)].collect().toSet ==
      audit.select("source", "n_rows", "content_sum")
        .as[(Option[String], Long, String)].collect().toSet)
  }

  test("appendIncremental: an empty batch composes to the unchanged " +
      "manifest, matched everywhere") {
    val dir = tmp("rel_inc2_")
    val m0 = Release.writeAndManifest(base, dir, "source", "doc_id", "text")
    val m1 = Release.appendIncremental(batch.filter(lit(false)), dir, m0,
      "source", "doc_id", "text")
    assert(m1.collect().forall(_.getAs[Boolean]("matched")))
    assert(m1.select("source", "n_rows", "content_sum")
        .as[(String, Long, String)].collect().toSet ==
      m0.select("source", "n_rows", "content_sum")
        .as[(String, Long, String)].collect().toSet)
  }

  test("appendIncremental trust model: matched attests the DELTA " +
      "landed; a wrong stored manifest poisons only the composition") {
    val dir = tmp("rel_inc3_")
    Release.writeAndManifest(base, dir, "source", "doc_id", "text").collect()
    val forged = Release.manifest(base.withColumn("text", lit("forged")),
      "source", "doc_id", "text")
    val m1 = Release.appendIncremental(batch, dir, forged, "source",
      "doc_id", "text")
    // the delta verification still passes (the landed files ARE the
    // batch)...
    assert(m1.collect().forall(_.getAs[Boolean]("matched")))
    // ...but the composed manifest no longer matches the artifact —
    // exactly the documented trust split (re-attest via the audit path)
    val audit = Release.manifest(spark.read.parquet(dir),
      "source", "doc_id", "text")
    assert(m1.select("source", "content_sum").as[(String, String)]
        .collect().toSet !=
      audit.select("source", "content_sum").as[(String, String)]
        .collect().toSet)
  }

  test("reconciliation detects loss, invention, and mangling " +
      "(unit-level on the pure arm)") {
    val beforeM = Release.manifest(base, "source", "doc_id", "text")
    val batchM = Release.manifest(batch, "source", "doc_id", "text")
    val good = Release.manifest(base.union(batch), "source", "doc_id", "text")
    // the balanced case matches everywhere
    val ok = Release.reconcileAppend(beforeM, batchM, good, "source")
      .collect()
    assert(ok.length == 3 && ok.forall(_.getAs[Boolean]("matched")))
    // loss: partition c missing from the artifact -> its row mismatches
    val lost = Release.reconcileAppend(beforeM, batchM,
        good.filter(col("source") =!= "c"), "source")
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Boolean]("matched")).toMap
    assert(!lost("c") && lost("a") && lost("b"))
    // invention: a partition nobody wrote -> mismatch on the null arm
    val invented = Release.reconcileAppend(beforeM, batchM,
        good.union(Seq(("z", 1L, "123", 1L, 1L)).toDF(
          "source", "n_rows", "content_sum", "min_id", "max_id")), "source")
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Boolean]("matched")).toMap
    assert(!invented("z") && invented("a"))
    // mangling: a shifted checksum (x10, always a different string)
    // -> that partition mismatches
    val mangled = Release.reconcileAppend(beforeM, batchM,
        good.withColumn("content_sum",
          when(col("source") === "b", concat(col("content_sum"), lit("0")))
            .otherwise(col("content_sum"))), "source")
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Boolean]("matched")).toMap
    assert(!mangled("b") && mangled("a") && mangled("c"))
  }
}
