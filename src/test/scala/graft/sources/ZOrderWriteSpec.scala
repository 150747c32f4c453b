package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.ZKernels

class ZOrderWriteSpec extends SparkSuite {
  import spark.implicits._

  test("interleave2 places bits at even/odd positions") {
    assert(ZKernels.interleave2(0L, 0L) == 0L)
    assert(ZKernels.interleave2(1L, 0L) == 1L)       // a bit 0 -> pos 0
    assert(ZKernels.interleave2(0L, 1L) == 2L)       // b bit 0 -> pos 1
    assert(ZKernels.interleave2(3L, 3L) == 15L)      // 0b1111
    assert(ZKernels.interleave2(0x7fffffffL, 0L) == 0x1555555555555555L)
    assert(ZKernels.interleave2(0L, 0x7fffffffL) == 0x2aaaaaaaaaaaaaaaL)
  }

  // 64x64 uniform grid
  private def grid = (0L until 4096L)
    .map(i => (i, i % 64L, i / 64L)).toDF("id", "x", "y")

  test("cluster survives an empty input and huge domains") {
    val empty = grid.filter(col("id") < 0)
    assert(ZOrderWrite.cluster(empty, "x", "y", 4).count() == 0L)
    // domain wider than 2^47: the integer scale would overflow Long
    val wide = (0L until 256L)
      .map(i => (i, i * (1L << 50), i * 3L)).toDF("id", "x", "y")
    val buckets = ZOrderWrite.cluster(wide, "x", "y", 4)
      .select(graft.functions.ZOrder.bucket16(col("x"), lit(0L),
        lit(255L * (1L << 50))).as("b"))
      .agg(min("b"), max("b")).head()
    assert(buckets.getLong(0) >= 0L && buckets.getLong(1) <= 65535L)
  }

  test("z-clustering bounds BOTH dimensions per partition; single-sort does not") {
    val spans = ZOrderWrite.cluster(grid, "x", "y", 16)
      .select(col("x"), col("y"), spark_partition_id().as("p"))
      .groupBy("p")
      .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
      .collect()
    assert(spans.length == 16)
    val worstX = spans.map(_.getAs[Long]("xs")).max
    val worstY = spans.map(_.getAs[Long]("ys")).max
    // ideal 4x4 tiling has span 15; range-boundary sampling can smear
    // a tile across a neighbor, so allow up to half the domain
    assert(worstX <= 32, s"x span $worstX")
    assert(worstY <= 32, s"y span $worstY")

    // sorting by x alone leaves y unbounded in every partition
    val xOnly = grid.repartitionByRange(16, col("x"))
      .select(col("y"), spark_partition_id().as("p"))
      .groupBy("p").agg((max("y") - min("y")).as("ys"))
      .collect().map(_.getAs[Long]("ys")).max
    assert(xOnly == 63L)
  }

  test("write produces the requested file count with tight footer ranges") {
    val dir = Files.createTempDirectory("zorder").toString
    // 16 files = a power-of-4 tile count, so z-ranges align to square
    // Morton blocks (a non-power-of-4 split can cross a quadrant seam
    // and smear one dimension — inherent to the curve, not a bug)
    ZOrderWrite.write(grid, dir, "x", "y", 16)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
    assert(files.length == 16)
    // re-read each file: both dims must be bounded (pruning would work)
    val perFile = spark.read.parquet(dir)
      .select(col("x"), col("y"), input_file_name().as("f"))
      .groupBy("f")
      .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
      .collect()
    assert(perFile.length == 16)
    assert(perFile.map(_.getAs[Long]("xs")).max <= 32)
    assert(perFile.map(_.getAs[Long]("ys")).max <= 32)
  }
}
