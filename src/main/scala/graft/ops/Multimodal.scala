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
}
