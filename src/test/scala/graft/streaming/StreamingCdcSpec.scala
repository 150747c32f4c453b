package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Cdc
import StreamingCdc.{Change, KeyState}

class StreamingCdcSpec extends SparkSuite {
  import spark.implicits._

  private def run(batches: Seq[Seq[Change]], name: String)
      : Map[Long, KeyState] = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Change]
    val query = StreamingCdc.materialize(in.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      batches.foreach { b => in.addData(b: _*); query.processAllAvailable() }
      spark.table(name)
        .withColumn("seq", monotonically_increasing_id())
        .groupBy("key")
        .agg(max_by(struct(col("version"), col("payload"),
          col("is_deleted"), col("n_conflicts")), col("seq")).as("e"))
        .select(col("key"), col("e.version"), col("e.payload"),
          col("e.is_deleted"), col("e.n_conflicts"))
        .as[KeyState].collect().map(s => s.key -> s).toMap
    } finally query.stop()
  }

  test("replayed changelog materializes to the batch merge, any order") {
    val snap = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("id", "name", "score")
    val cl = Seq(
      (1L, "a2", 11, 1L, "upsert"),
      (1L, "a3", 12, 3L, "upsert"),
      (2L, "b", 20, 1L, "delete"),
      (4L, "d", 40, 1L, "upsert"))
      .toDF("id", "name", "score", "version", "op")
    val batch = Cdc.applyChangelog(snap, cl, "id", "version", "op")
      .select(col("id"), col("version"),
        to_json(struct(col("name"), col("score"))).as("p"))
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

    // stream = snapshot rows (version 0) + changelog, SHUFFLED and
    // split so higher versions can arrive before lower ones
    val snapCh = StreamingCdc.changes(
      snap.withColumn("version", lit(0L)).withColumn("op", lit("upsert")),
      "id", "version", "op").collect().toSeq
    val clCh = StreamingCdc.changes(cl, "id", "version", "op")
      .collect().toSeq
    val all = (snapCh ++ clCh).sortBy(c => (c.key, -c.version))
    val got = run(Seq(all.take(3), all.drop(3)), "cdc_parity")

    batch.foreach { case (k, (v, p)) =>
      val s = got(k)
      assert(s.version == v && s.payload == p && s.is_deleted == 0,
        s"key $k: $s vs $v/$p")
    }
    // deleted key 2: tombstone, version 1
    assert(got(2L).is_deleted == 1 && got(2L).version == 1L)
    assert(got.values.forall(_.n_conflicts == 0L))
  }

  test("late lower versions never overwrite; equal-version conflicts count") {
    val b1 = Seq(Change(7L, 5L, "upsert", """{"x":1}"""))
    val late = Seq(Change(7L, 3L, "upsert", """{"x":0}"""))
    val dup = Seq(Change(7L, 5L, "upsert", """{"x":1}"""))   // exact dup: ok
    val conflict = Seq(Change(7L, 5L, "upsert", """{"x":9}"""))
    val got = run(Seq(b1, late, dup, conflict), "cdc_conflict")(7L)
    assert(got.version == 5L && got.payload == """{"x":1}""")
    assert(got.n_conflicts == 1L)
  }
}
