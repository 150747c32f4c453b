package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the test corpus (TPC-H-ish star schema + events/documents/
  * embeddings). Everything downstream is DataFrame-shaped, so swapping in
  * any other Spark source (csv/json/jdbc/kafka) is a one-line change —
  * mirroring how the reference treats ClickHouse as just "a table"
  * (/root/reference/main.go:279).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // One logical plan per (session, table): file listing + footer schema
  // inference run once per session instead of once per query — part of
  // the per-query constant floor in a 42-query batch. DataFrames are
  // immutable plans, so sharing one across queries is safe.
  private val memo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    memo.getOrElseUpdate((spark, dir, name), {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark has no native
      // type for — read it as a long and truncate to a micros timestamp
      // (identical to how DuckDB's TIMESTAMP_NS→TIMESTAMP truncation sees
      // the same value, so both sides of the oracle compare agree).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema.fields.foldLeft(df) {
        case (acc, f) if f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType =>
          // `div` keeps the arithmetic integral (a double round-trip would
          // lose precision above 2^53 — epoch nanos are ~1.7e18).
          acc.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
        case (acc, f) if f.name == "ts" && f.dataType == org.apache.spark.sql.types.TimestampNTZType =>
          // Parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as
          // TIMESTAMP_NTZ, which unix_micros() and every event-time
          // consumer reject. Every entrypoint pins the session TZ to UTC,
          // so casting to the instant-carrying TIMESTAMP type is
          // value-identical — and DuckDB, which reads the same file as
          // naive micros, still agrees bit-for-bit.
          acc.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
        case (acc, _) => acc
      }
    })

  /** Register all tables as temp views named after themselves (what the
    * DuckDB oracle side does too), so spark.sql(...) works symmetrically.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
