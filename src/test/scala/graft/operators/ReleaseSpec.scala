package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class ReleaseSpec extends SparkSuite {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "a", "alpha text"), (2L, "a", "beta text"), (3L, "a", "gamma"),
    (4L, "a", "delta"), (5L, "a", "epsilon"),
    (6L, "b", "zeta"), (7L, "b", null.asInstanceOf[String])
  ).toDF("doc_id", "source", "text")

  test("write-read manifest equals the in-memory manifest, across file splits") {
    val dir = java.nio.file.Files.createTempDirectory("rel_spec_").toString
    val written = Release.writeAndManifest(corpus, dir, "source",
        "doc_id", "text", maxRecordsPerFile = 2L)
      .orderBy("source")
      .as[(String, Long, String, Long, Long)].collect().toSeq
    val direct = Release.manifest(corpus, "source", "doc_id", "text")
      .orderBy("source")
      .as[(String, Long, String, Long, Long)].collect().toSeq
    assert(written == direct)
    assert(written.map(r => r._1 -> r._2).toMap == Map("a" -> 5L, "b" -> 2L))
    // maxRecordsPerFile=2 actually split partition a into >= 3 files
    val files = new java.io.File(s"$dir/source=a")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files >= 3, s"files=$files")
  }

  test("manifest is order-independent but content-sensitive") {
    val base = Release.manifest(corpus, "source", "doc_id", "text")
      .orderBy("source").as[(String, Long, String, Long, Long)]
      .collect().toSeq
    val shuffled = Release.manifest(corpus.orderBy(rand(42)).repartition(5),
        "source", "doc_id", "text")
      .orderBy("source").as[(String, Long, String, Long, Long)]
      .collect().toSeq
    assert(shuffled == base)
    // one flipped character changes the partition checksum
    val tampered = Release.manifest(
        corpus.withColumn("text",
          when(col("doc_id") === 3L, lit("gamma!")).otherwise(col("text"))),
        "source", "doc_id", "text")
      .orderBy("source").as[(String, Long, String, Long, Long)]
      .collect().toSeq
    assert(tampered.head._3 != base.head._3)   // source a differs
    assert(tampered.last == base.last)         // source b untouched
  }
}
