package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SnapshotSpec extends SparkSuite {
  import spark.implicits._

  test("diff classifies added/removed/changed/unchanged exactly") {
    val prev = Seq(
      (1L, "stays the same"),
      (2L, "will be rewritten"),
      (3L, "will be dropped")).toDF("doc_id", "text")
    val next = Seq(
      (1L, "stays the same"),
      (2L, "was rewritten"),
      (4L, "brand new doc")).toDF("doc_id", "text")
    val out = Snapshot.diff(prev, next, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("change"))
      .toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
    val summary = Snapshot.diffSummary(prev, next, "doc_id", "text")
      .collect().map(r => r.getAs[String]("change") -> r.getAs[Long]("n_docs"))
      .toMap
    assert(summary == Map("unchanged" -> 1L, "changed" -> 1L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("diff of identical snapshots is all-unchanged; vs empty is all-added") {
    val docs = Seq((1L, "a a a"), (2L, "b b b")).toDF("doc_id", "text")
    val same = Snapshot.diff(docs, docs, "doc_id", "text")
      .collect().map(_.getAs[String]("change")).distinct
    assert(same.toSeq == Seq("unchanged"))
    val empty = docs.filter(col("doc_id") < 0)
    val allAdded = Snapshot.diff(empty, docs, "doc_id", "text")
      .collect().map(_.getAs[String]("change")).distinct
    assert(allAdded.toSeq == Seq("added"))
  }
}
