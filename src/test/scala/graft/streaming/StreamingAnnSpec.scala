package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.operators.IvfIndex

final case class AnnQuery(vec_id: Long, embedding: Array[Float])

class StreamingAnnSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def corpus = spark.read.parquet(s"$dir/embeddings.parquet")

  test("stream search equals batch IvfIndex.search row-for-row") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext

    val index = IvfIndex.buildDeterministic(corpus, "vec_id", "embedding",
      nlist = 8)
    val queryRows = corpus.filter("vec_id < 6")
      .collect()
      .map(r => AnnQuery(r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray))

    // postings persisted, as a serving deployment would: the static
    // side of a stream-static join re-runs per micro-batch
    val posts = StreamingAnn.postings(index).persist()
    try {
      val mem = MemoryStream[AnnQuery]
      val out = StreamingAnn.search(mem.toDF(), index, posts,
        "vec_id", "embedding", k = 5, nprobe = 3)
      val query = out.writeStream.format("memory")
        .queryName("ann_stream").outputMode("append").start()
      val streamed = try {
        // two micro-batches: serving is incremental, results must not
        // depend on batch boundaries
        mem.addData(queryRows.take(3): _*)
        query.processAllAvailable()
        mem.addData(queryRows.drop(3): _*)
        query.processAllAvailable()
        spark.table("ann_stream").collect()
          .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk"),
            r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos")))
          .sortBy(t => (t._1, t._2))
      } finally query.stop()

      val batch = IvfIndex.search(index, corpus.filter("vec_id < 6"),
          "vec_id", "embedding", k = 5, nprobe = 3)
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk"),
          r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos")))
        .sortBy(t => (t._1, t._2))

      assert(streamed.nonEmpty)
      assert(streamed.toSeq == batch.toSeq)
    } finally posts.unpersist()
  }

  test("probe choice: stream kernel probes the batch kernel's cells") {
    val index = IvfIndex.buildDeterministic(corpus, "vec_id", "embedding",
      nlist = 8)
    // nprobe = nlist degenerates to brute force over all cells: stream
    // and batch must then BOTH return the exact global top-k
    val all = StreamingAnn.search(corpus.filter("vec_id < 3"), index,
        "vec_id", "embedding", k = 3, nprobe = 8)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("rnk"), r.getAs[Long]("neighbor_id")))
    val brute = graft.operators.Similarity.bruteTopK(corpus,
        corpus.filter("vec_id < 3"), "vec_id", "embedding", 3)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("rnk"), r.getAs[Long]("neighbor_id")))
    assert(all.sortBy(t => (t._1, t._2)).toSeq ==
      brute.sortBy(t => (t._1, t._2)).toSeq)
  }
}
