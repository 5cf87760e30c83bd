package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata extracted by batched partition-wise decoders.
  *
  * The Spark-side machinery is real and tested — schema, partition-wise
  * batching, column pruning before the decode (only the blob + id columns
  * reach the decoder) — while the actual media decode is STUBBED with a
  * deterministic byte-derived fake (`???`-equivalent), because no media
  * libraries exist in this container. Swapping `StubDecoder` for a real
  * JNI/FFmpeg decoder changes nothing upstream.
  */
object Multimodal {

  final case class MediaMeta(
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      format: String)

  /** The decode stub: deterministic metadata derived from the raw bytes.
    * A real implementation would parse the container header here.
    */
  object StubDecoder {
    def decode(bytes: Array[Byte]): MediaMeta = {
      val n = bytes.length.toLong
      MediaMeta(
        n_bytes = n,
        width = (n % 640L).toInt + 16,
        height = ((n * 7L) % 480L).toInt + 16,
        n_frames = (n % 24L).toInt + 1,
        format = if (n % 2L == 0L) "even" else "odd")
    }
  }

  private val metaSchema = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** Decode metadata for each row's blob column, partition-wise (the Scala
    * analog of a `mapInPandas` batch UDF: one decoder instance per
    * partition, rows streamed through it). Output = `idCol` + metadata
    * columns.
    */
  def extractMeta(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val pruned = df.select(col(idCol), col(blobCol))
    val outSchema = StructType(pruned.schema.fields.take(1) ++ metaSchema.fields)
    pruned.mapPartitions { rows =>
      // per-partition decoder init happens here (stub has no state)
      rows.map { r =>
        val meta = StubDecoder.decode(r.getAs[Array[Byte]](1))
        Row(
          r.get(0),
          meta.n_bytes,
          meta.width,
          meta.height,
          meta.n_frames,
          meta.format)
      }
    }(Encoders.row(outSchema))
  }

  /** Frame sampling: one output row per sampled frame (`every`-th frame of
    * the stubbed decode), each carrying a deterministic frame fingerprint —
    * the video-curation plumbing shape (explode-by-frame, partition-wise
    * decode, no shuffle). A real decoder would emit frame blobs here.
    */
  def frameSample(
      df: DataFrame,
      idCol: String,
      blobCol: String,
      every: Int = 4): DataFrame = {
    val pruned = df.select(col(idCol), col(blobCol))
    val outSchema = StructType(pruned.schema.fields.take(1) ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_fp", LongType, nullable = false)))
    pruned.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val meta = StubDecoder.decode(bytes)
        (0 until meta.n_frames by every).iterator.map { f =>
          // deterministic per-frame fingerprint from the byte prefix
          val fp = bytes.iterator.take(64).foldLeft(1125899906842597L) {
            (acc, b) => acc * 31 + b
          } + f
          Row(r.get(0), f, fp)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Fixed-dimension feature extraction: a deterministic `dim`-float vector
    * per blob (byte-histogram projection stub) — the embed-everything
    * plumbing shape: binary in, `Array[Float]` out, ready for
    * [[Similarity]] operators downstream. A real implementation would run
    * the encoder model here, batched per partition.
    */
  def featureExtract(
      df: DataFrame,
      idCol: String,
      blobCol: String,
      dim: Int = 16): DataFrame = {
    val pruned = df.select(col(idCol), col(blobCol))
    val outSchema = StructType(pruned.schema.fields.take(1) :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    pruned.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val acc = new Array[Float](dim)
        var i = 0
        while (i < bytes.length) {
          acc(i % dim) += (bytes(i) & 0xff) / 255.0f
          i += 1
        }
        Row(r.get(0), acc.toSeq)
      }
    }(Encoders.row(outSchema))
  }
}
