package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** E1: int8 embedding quantization — the storage/bandwidth transform a
  * 100 TB embedding corpus goes through before ANN serving (4x smaller
  * vectors, SIMD-friendly integer dot products downstream).
  *
  * Symmetric per-vector scheme: scale = amax/127, code(x) =
  * clamp(round(x/scale), ±127). Pure map (higher-order lambdas, no
  * shuffle, no UDF). Error metrics use only order-independent
  * reductions (array_max) and per-element IEEE chains, so they are
  * bit-reproducible on any engine — no float sum whose result depends
  * on partitioning.
  */
object Quantization {

  private def code(x: Column, scale: Column): Column =
    greatest(lit(-127.0), least(lit(127.0), round(x / scale, 0)))

  /** Per-vector quantization report: dimension, scale, saturated-code
    * count, and max absolute dequantization error. Zero vectors get
    * scale 0 / error 0 (nothing to quantize).
    */
  def int8Report(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    // the internal column is NOT named "scale": the output aliases a
    // rounded display copy to that name, and Spark's lateral column
    // alias resolution would silently bind the error lambda's
    // reference to the rounded alias instead of the raw value
    df.select(col(idCol).as("vec_id"), v.as("v"))
      .withColumn("__amax", array_max(transform(col("v"), x => abs(x))))
      .withColumn("__scale", col("__amax") / 127.0)
      .select(
        col("vec_id"),
        size(col("v")).cast("long").as("dim"),
        round(col("__scale"), 6).as("scale"),
        when(col("__amax") === 0.0, 0L).otherwise(
          size(filter(col("v"),
            x => abs(code(x, col("__scale"))) >= 127.0)).cast("long"))
          .as("n_sat"),
        when(col("__amax") === 0.0, 0.0).otherwise(
          round(array_max(transform(col("v"),
            x => abs(x - code(x, col("__scale")) * col("__scale")))), 6))
          .as("max_abs_err"))
  }
}
