package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** P13b: the release compactor — manifest equality is the gate (the
  * P13 checksum is order-independent by construction, so the rewrite
  * must reproduce it string-for-string), plus the file-count facts the
  * op exists for.
  */
class ReleaseCompactionSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // 40 docs over two sources; text null on one row to pin the
  // null-safe checksum path through the rewrite.
  private def corpus = (1L to 40L).map(i =>
      (i, if (i <= 25) "a" else "b",
        if (i == 7L) null.asInstanceOf[String] else s"doc number $i"))
    .toSeq.toDF("doc_id", "source", "text")

  private def parquetFiles(dir: String, part: String): Int =
    new java.io.File(s"$dir/source=$part")
      .listFiles().count(_.getName.endsWith(".parquet"))

  test("fragmented release compacts to one file per partition with the " +
      "manifest reproduced string-for-string") {
    val src = tmp("rel_cpt_src_")
    val dst = tmp("rel_cpt_dst_")
    // fragment: 5-row files -> 5 files in source=a, 3 in source=b
    Release.writeAndManifest(corpus, src, "source", "doc_id", "text",
      maxRecordsPerFile = 5L).collect()
    assert(parquetFiles(src, "a") >= 5 && parquetFiles(src, "b") >= 3)
    val rep = Release.compact(spark, src, dst, "source", "doc_id", "text",
        targetRecordsPerFile = 100L)
      .orderBy("source").collect()
    assert(rep.length == 2)
    rep.foreach { r =>
      assert(r.getAs[Boolean]("matched"))
      assert(r.getAs[String]("content_sum_before") ==
        r.getAs[String]("content_sum_after"))
      assert(r.getAs[Long]("n_rows_before") == r.getAs[Long]("n_rows_after"))
      assert(r.getAs[Long]("files_after") == 1L)
      assert(r.getAs[Long]("files_before") > r.getAs[Long]("files_after"))
    }
    // and the manifest of the compacted artifact equals the source's
    val before = Release.manifest(spark.read.parquet(src),
      "source", "doc_id", "text").orderBy("source")
      .as[(String, Long, String, Long, Long)].collect().toSeq
    val after = Release.manifest(spark.read.parquet(dst),
      "source", "doc_id", "text").orderBy("source")
      .as[(String, Long, String, Long, Long)].collect().toSeq
    assert(after == before)
  }

  test("target below the partition size splits into bounded files, " +
      "content still identical") {
    val src = tmp("rel_cpt_src2_")
    val dst = tmp("rel_cpt_dst2_")
    Release.writeAndManifest(corpus, src, "source", "doc_id", "text",
      maxRecordsPerFile = 3L).collect()
    val rep = Release.compact(spark, src, dst, "source", "doc_id", "text",
        targetRecordsPerFile = 10L)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(rep.values.forall(_.getAs[Boolean]("matched")))
    // a: 25 rows / target 10 -> k = 3 hash bins; b: 15 rows -> 2 bins.
    // The record bound forces >= ceil(n/target) files; binomial bin
    // spread and task collisions bound the top at 2k (each of <= k
    // bins splits at most once at these sizes), so the assertions pin
    // the CONTRACT (bounded files, fragmentation gone), not one hash
    // outcome.
    val fa = rep("a").getAs[Long]("files_after")
    val fb = rep("b").getAs[Long]("files_after")
    assert(fa >= 3L && fa <= 6L, s"files_after(a)=$fa")
    assert(fb >= 2L && fb <= 4L, s"files_after(b)=$fb")
    // every written file respects the record bound
    for (p <- Seq("a", "b");
         f <- new java.io.File(s"$dst/source=$p").listFiles()
           if f.getName.endsWith(".parquet")) {
      assert(spark.read.parquet(f.getPath).count() <= 10L)
    }
  }

  test("a NULL partition value survives compaction (Hive default " +
      "partition dir, null-safe joins end-to-end)") {
    val src = tmp("rel_cpt_null_src_")
    val dst = tmp("rel_cpt_null_dst_")
    val withNull = corpus.withColumn("source",
      when(col("doc_id") % 3 === 0, lit(null: String))
        .otherwise(col("source")))
    Release.writeAndManifest(withNull, src, "source", "doc_id", "text",
      maxRecordsPerFile = 4L).collect()
    val rep = Release.compact(spark, src, dst, "source", "doc_id", "text",
        targetRecordsPerFile = 100L)
      .collect()
    assert(rep.length == 3) // a, b, and the null partition
    assert(rep.forall(_.getAs[Boolean]("matched")))
    val nullRow = rep.find(_.isNullAt(rep.head.fieldIndex("source"))).get
    assert(nullRow.getAs[Long]("n_rows_after") == 13L) // 40/3 rounded: ids 3,6,...,39
    assert(nullRow.getAs[Long]("files_after") == 1L)
    // and the compacted artifact round-trips the null partition rows
    assert(spark.read.parquet(dst).filter(col("source").isNull).count() == 13L)
  }

  test("compaction refuses to rewrite the source dir in place") {
    val src = tmp("rel_cpt_src3_")
    Release.writeAndManifest(corpus, src, "source", "doc_id", "text",
      maxRecordsPerFile = 5L).collect()
    val e = intercept[IllegalArgumentException](
      Release.compact(spark, src, src + "/", "source", "doc_id", "text", 10L))
    assert(e.getMessage.contains("new directory"))
    // nested either way is the same corruption class
    val e2 = intercept[IllegalArgumentException](
      Release.compact(spark, src, src + "/compacted", "source",
        "doc_id", "text", 10L))
    assert(e2.getMessage.contains("new directory"))
    val e3 = intercept[IllegalArgumentException](
      Release.compact(spark, src, new java.io.File(src).getParent,
        "source", "doc_id", "text", 10L))
    assert(e3.getMessage.contains("new directory"))
    // URI spelling must not defeat the guard: 'file://<p>' and '<p>'
    // name the same location (java.io.File canonicalization treated
    // them as different paths — the hole this guard version closes)
    val e4 = intercept[IllegalArgumentException](
      Release.compact(spark, src, "file://" + src,
        "source", "doc_id", "text", 10L))
    assert(e4.getMessage.contains("new directory"))
    val e5 = intercept[IllegalArgumentException](
      Release.compact(spark, "file://" + src, src + "/compacted",
        "source", "doc_id", "text", 10L))
    assert(e5.getMessage.contains("new directory"))
  }

  test("a corrupted rewrite cannot read as matched (full-join null arms " +
      "included)") {
    // simulate by comparing manifests of src vs a TAMPERED copy through
    // the same verification shape compact returns: drop a partition
    val src = tmp("rel_cpt_src4_")
    val dst = tmp("rel_cpt_dst4_")
    Release.writeAndManifest(corpus, src, "source", "doc_id", "text",
      maxRecordsPerFile = 5L).collect()
    Release.compact(spark, src, dst, "source", "doc_id", "text", 100L)
      .collect()
    // delete partition b from the compacted copy, then re-verify via
    // manifest comparison — the loss must be visible
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(s"$dst/source=b"))
    val before = Release.manifest(spark.read.parquet(src),
      "source", "doc_id", "text").select("source", "content_sum")
    val after = Release.manifest(spark.read.parquet(dst),
      "source", "doc_id", "text").select("source", "content_sum")
    val joined = before.join(after, Seq("source"), "full_outer")
    assert(joined.count() == 2)
    assert(joined.filter(col("source") === "b")
      .collect().head.anyNull)
  }

  test("a second pass over an already-compacted release is a no-op on " +
      "file counts (idempotent maintenance)") {
    val src = tmp("rel_cpt_src5_")
    val d1 = tmp("rel_cpt_d1_")
    val d2 = tmp("rel_cpt_d2_")
    Release.writeAndManifest(corpus, src, "source", "doc_id", "text",
      maxRecordsPerFile = 2L).collect()
    Release.compact(spark, src, d1, "source", "doc_id", "text", 100L).collect()
    val rep2 = Release.compact(spark, d1, d2, "source", "doc_id", "text",
      100L).collect()
    assert(rep2.forall(r => r.getAs[Boolean]("matched") &&
      r.getAs[Long]("files_before") == 1L &&
      r.getAs[Long]("files_after") == 1L))
  }
}
