package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Profiling

object StreamingColumnProfileSpec {
  final case class Doc(id: java.lang.Long, lang: String)
}

class StreamingColumnProfileSpec extends SparkSuite {
  import spark.implicits._
  import StreamingColumnProfileSpec.Doc

  test("running profile: exact n/null legs, banded distinct, batch parity") {
    implicit val ctx = spark.sqlContext
    val docs = (1 to 400).map { i =>
      Doc(if (i % 5 == 0) null else java.lang.Long.valueOf(i % 37),
        if (i % 11 == 0) null else s"l${i % 7}")
    }
    val (b1, b2) = docs.splitAt(150)

    val in = MemoryStream[Doc]
    val query = StreamingColumnProfile.profile(in.toDF(), Seq("id", "lang"))
      .writeStream.format("memory").queryName("colprof_stream")
      .outputMode("update").start()
    try {
      in.addData(b1: _*); query.processAllAvailable()
      in.addData(b2: _*); query.processAllAvailable()

      val streamed = spark.table("colprof_stream")
        .withColumn("seq", monotonically_increasing_id())
        .groupBy("col_name")
        .agg(max_by(struct(col("n_rows"), col("n_null"),
          col("approx_distinct")), col("seq")).as("e"))
        .select(col("col_name"), col("e.n_rows"), col("e.n_null"),
          col("e.approx_distinct"))
        .as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

      val batch = Profiling.columnProfile(docs.toDF(), Seq("id", "lang"))
        .as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

      for (c <- Seq("id", "lang")) {
        val (sn, snull, sdist) = streamed(c)
        val (bn, bnull, bdist) = batch(c)
        assert((sn, snull) == ((bn, bnull)), s"$c exact legs diverged")
        // HLL band: same discipline as the A10 gate (5% or ±1)
        assert(math.abs(sdist - bdist) <= math.max(1L, math.round(bdist * 0.05)),
          s"$c approx_distinct $sdist outside the band around $bdist")
      }
      // explicit arithmetic: 400 rows; id null every 5th = 80;
      // lang null every 11th = 36
      assert(streamed("id")._1 == 400L && streamed("id")._2 == 80L)
      assert(streamed("lang")._2 == 36L)
    } finally query.stop()
  }
}
