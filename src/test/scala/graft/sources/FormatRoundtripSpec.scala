package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Everything downstream of a loader is DataFrame-shaped, so the
  * engine works over any Spark source. Prove it: run a real operator
  * over the same data loaded from parquet, csv, and json and get
  * identical results.
  */
class FormatRoundtripSpec extends SparkSuite {

  test("operators are source-agnostic (parquet == csv == json)") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, dir, "documents")

    val csvPath = "/tmp/graft-docs-csv"
    val jsonPath = "/tmp/graft-docs-json"
    docs.write.mode("overwrite").option("header", "true")
      .option("quote", "\"").option("escape", "\"").csv(csvPath)
    docs.write.mode("overwrite").json(jsonPath)

    val fromCsv = spark.read.option("header", "true")
      .option("quote", "\"").option("escape", "\"")
      .schema(docs.schema).csv(csvPath)
    val fromJson = spark.read.schema(docs.schema).json(jsonPath)

    def fingerprints(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      graft.operators.TextAnalysis.fingerprint(df, "doc_id", "text")
        .collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fp")).toMap

    val base = fingerprints(docs)
    assert(base.size == 500)
    assert(fingerprints(fromCsv) == base)
    assert(fingerprints(fromJson) == base)
  }
}
