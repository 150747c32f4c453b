package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One sampled frame from an opaque media payload. */
final case class MediaFrame(
    doc_id: Long,
    frame_idx: Int,
    frame_hex: String,
    frame_mean: Double)

/** Typed metadata extracted from an opaque media payload. */
final case class MediaMeta(
    doc_id: Long,
    size_bytes: Int,
    magic: String,
    width: Int,
    height: Int,
    n_frames: Int,
    mean_byte: Double)

/** M1 (SURVEY.md §2.3): multimodal columns. Images/audio/video travel
  * as opaque `binary` columns; decode/feature-extraction runs as
  * batched per-partition processing — the Spark-side plumbing (schema,
  * partitioning, batch shape) is real, while the decoder itself is a
  * STUB: this container has no image/audio libraries, so `decodeStub`
  * computes a deterministic fake "decode" from the payload bytes. At
  * deployment the stub body is replaced by a real codec call; nothing
  * else changes.
  *
  * mapInPandas equivalence: this is the same executor contract a
  * Python decoder would use via `df.mapInPandas(fn, schema)` —
  * iterator of fixed-size batches in, iterator of typed rows out,
  * decoder state initialized once per partition, output schema
  * declared up front (the case classes here play the role of the
  * pandas UDF's schema string). A deployment whose codecs live in
  * Python swaps `mapPartitions(decodeBatches)` for `mapInPandas`
  * with a batch size set by `spark.sql.execution.arrow
  * .maxRecordsPerBatch` — partitioning, schema, and the 1:N frame
  * fanout shape carry over unchanged.
  */
object Multimodal {

  /** Batch size for the per-partition decode loop — mirrors the arrow
    * batch shape a vectorized (pandas-style) UDF would see.
    */
  val DecodeBatchSize: Int = 64

  /** STUB decoder: derives (width, height, n_frames, mean_byte) from
    * the payload deterministically. Replace with a real codec at
    * deployment; signature (bytes in, features out) is the contract.
    */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val u = bytes.map(_ & 0xff)
    // degenerate payloads decode to a 64x64 single frame instead of
    // crashing the task (a real decoder would classify them corrupt)
    def byteAt(i: Int): Int = if (u.length > i) u(i) else 0
    MediaMeta(
      doc_id = id,
      size_bytes = bytes.length,
      magic = bytes.take(2).map("%02x".format(_)).mkString,
      width = 64 + (byteAt(0) % 16) * 32,
      height = 64 + (byteAt(1) % 16) * 32,
      n_frames = 1 + byteAt(2) % 8,
      mean_byte = if (u.isEmpty) 0.0 else u.sum.toDouble / u.length)
  }

  /** Frame sampling: one media payload -> several frame rows, the
    * 1:N decode shape (video frames, audio windows). Stub "frames" are
    * fixed-width byte slices; a real decoder plugs into the same
    * mapPartitions+flatMap contract and nothing else changes.
    */
  def sampleFrames(df: DataFrame, idCol: String, mediaCol: String,
      frameBytes: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(mediaCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap { batch =>
          batch.iterator.flatMap { case (id, bytes) =>
            bytes.grouped(frameBytes).zipWithIndex.map { case (fb, i) =>
              val u = fb.map(_ & 0xff)
              MediaFrame(id, i, fb.map("%02x".format(_)).mkString,
                u.sum.toDouble / u.length)
            }
          }
        }
      }
      .toDF()
  }

  /** Resize: recompute target dimensions preserving aspect ratio —
    * the stub scales the decoded metadata; a real implementation
    * transforms pixels inside the same batched mapPartitions contract
    * and emits the resized payload alongside.
    */
  def resizeStub(df: DataFrame, idCol: String, mediaCol: String,
      maxSide: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(mediaCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            val m = decodeStub(id, bytes)
            val scale = math.min(1.0,
              maxSide.toDouble / math.max(m.width, m.height))
            (m.doc_id, m.width, m.height,
              math.max(1, math.round(m.width * scale).toInt),
              math.max(1, math.round(m.height * scale).toInt),
              scale)
          }
        }
      }
      .toDF("doc_id", "width", "height", "out_width", "out_height", "scale")
  }

  /** Decode a (id, media binary) DataFrame into typed metadata rows.
    * mapPartitions + grouped(batch) is the Scala analog of mapInPandas:
    * per-partition, batched, no driver involvement, schema declared via
    * the case-class encoder.
    */
  def extractMeta(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(mediaCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap { batch =>
          // real decoders amortize setup per batch; the stub has none
          batch.iterator.map { case (id, bytes) => decodeStub(id, bytes) }
        }
      }
      .toDF()
  }
}
