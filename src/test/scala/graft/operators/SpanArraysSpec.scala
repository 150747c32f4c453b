package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Pins the r18 positions-as-array rewrite: [[Dedup.spanArrays]]' in-row
  * interval merge must produce EXACTLY the maximal islands the old
  * explode + gaps-and-islands window chain produced over the covered
  * positions — including adjacency (next start = prev + n merges),
  * one-past adjacency (next = prev + n + 1 breaks), overlap, singleton
  * docs and multi-island docs.
  */
class SpanArraysSpec extends SparkSuite {

  /** The pre-r18 reference: explode starts to covered positions,
    * distinct, gaps-and-islands window, one row per maximal island.
    */
  private def referenceSpans(hits: org.apache.spark.sql.DataFrame, n: Int) = {
    val covered = hits
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("tp"))
      .distinct()
    val w = Window.partitionBy(col("doc_id")).orderBy(col("tp"))
    covered
      .withColumn("__new",
        when(lag(col("tp"), 1).over(w).isNull ||
          col("tp") > lag(col("tp"), 1).over(w) + 1, 1L).otherwise(0L))
      .withColumn("__sid", sum(col("__new")).over(w))
      .groupBy(col("doc_id"), col("__sid"))
      .agg(min(col("tp")).cast("int").as("s"),
        max(col("tp")).cast("int").as("e"))
      .select("doc_id", "s", "e")
  }

  private def check(rows: Seq[(Long, Int)], n: Int): Unit = {
    import spark.implicits._
    val hits = rows.toDF("doc_id", "pos")
    val got = Dedup.spanArrays(hits, n)
      .select(col("doc_id"), explode(col("__spans")).as("sp"))
      .select(col("doc_id"), col("sp.s"), col("sp.e"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted
    val want = referenceSpans(hits, n)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted
    assert(got.toSeq == want.toSeq)
  }

  test("merge identities across adjacency/gap/overlap boundary cases") {
    val n = 5
    check(Seq(
      // doc 1: overlap (3 < 1+5), adjacency (8 = 3+5) -> one island
      1L -> 1, 1L -> 3, 1L -> 8,
      // doc 2: one-past adjacency (7 = 1+5+1) -> two islands
      2L -> 1, 2L -> 7,
      // doc 3: singleton
      3L -> 42,
      // doc 4: three islands with mixed merges
      4L -> 10, 4L -> 11, 4L -> 20, 4L -> 40, 4L -> 45, 4L -> 50,
      // doc 5: long chain of exact adjacency
      5L -> 1, 5L -> 6, 5L -> 11, 5L -> 16), n)
  }

  test("merge identities at n=1 and n=13 (GPT-3 scrub width)") {
    check(Seq(1L -> 1, 1L -> 2, 1L -> 4, 2L -> 9), 1)
    check(Seq(1L -> 1, 1L -> 14, 1L -> 15, 1L -> 40, 2L -> 3), 13)
  }

  test("randomized identity sweep") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(2, 5, 8)) {
      val rows = (0 until 40).map { _ =>
        (rnd.nextInt(6).toLong, 1 + rnd.nextInt(60))
      }.distinct
      check(rows, n)
    }
  }
}
