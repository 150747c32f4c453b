package graft.sources

import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The driver's testdata has changed `ts` encoding twice across rounds
  * (TIMESTAMP(NANOS) → nanos-as-long → TIMESTAMP_NTZ micros), and each
  * change broke every `unix_micros(ts)` consumer until the loader learned
  * the new shape. This spec synthesizes all three encodings the corpus has
  * ever shipped and pins that `Tables.load` normalizes each of them to an
  * instant-carrying TIMESTAMP with the identical epoch-micros value — so
  * the next regeneration is a red test here, not a red round.
  */
class TablesSchemaDriftSpec extends SparkSuite {
  import spark.implicits._

  // One known instant, expressed in epoch micros (UTC session pinned in
  // TestSpark, so naive and instant readings agree).
  private val micros = Seq(1700000000000000L, 1700000123456789L)

  private def freshDir(): String =
    Files.createTempDirectory("graft-ts-drift").toString

  private def assertLoads(dir: String): Unit = {
    val df = Tables.load(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType,
      s"loader must normalize to TIMESTAMP, got ${df.schema("ts").dataType}")
    val got = df.select(expr("unix_micros(ts)").as("us"))
      .as[Long].collect().sorted
    assert(got.toSeq == micros.sorted, s"epoch micros mismatch: ${got.toSeq}")
  }

  test("ts as nanos-as-long (legacy TIMESTAMP(NANOS) read) normalizes") {
    // Spark cannot write TIMESTAMP(NANOS); with nanosAsLong=true such a
    // column arrives as plain LongType, indistinguishable from this int64.
    val dir = freshDir()
    micros.map(_ * 1000L).toDF("ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assertLoads(dir)
  }

  test("ts as TIMESTAMP_NTZ micros (current testdata shape) normalizes") {
    val dir = freshDir()
    micros.toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assertLoads(dir)
  }

  test("ts as instant TIMESTAMP (tz-adjusted) passes through") {
    val dir = freshDir()
    micros.toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assertLoads(dir)
  }
}
