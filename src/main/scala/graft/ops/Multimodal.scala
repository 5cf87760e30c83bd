package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata extracted by batched partition-wise decoders.
  *
  * Image formats the JDK ships codecs for (PNG, GIF, BMP, JPEG via
  * `javax.imageio`) are decoded FOR REAL — magic-byte sniff, then
  * `ImageIO.read` for dimensions and per-channel pixel statistics; the
  * `m_media_meta` / `m_image_stats` driver gates hash-check real decoded
  * values against closed-form oracles over generated PNG fixtures. Audio
  * formats the JDK ships parsers for (WAV/AIFF/AU via
  * `javax.sound.sampled`) are ALSO decoded for real — [[audioStats]]
  * reads the container header and every PCM sample through
  * `AudioSystem`, hash-gated (`m_audio_stats`) against a sawtooth
  * fixture's per-sample oracle. Formats the JDK lacks (video containers,
  * compressed audio) fall back to [[StubDecoder]], a deterministic
  * byte-derived fake — swapping it for a JNI/FFmpeg decoder changes
  * nothing upstream: schema, partition-wise batching and column pruning
  * (only blob + id reach the decoder) are the real, format-independent
  * machinery.
  */
object Multimodal {

  final case class MediaMeta(
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      format: String)

  /** Magic-byte container sniff for the formats `javax.imageio` decodes.
    * (A real pipeline would extend this table per codec library.)
    */
  def sniffImageFormat(bytes: Array[Byte]): Option[String] = {
    def at(i: Int): Int = if (i < bytes.length) bytes(i) & 0xff else -1
    if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G')
      Some("png")
    else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8')
      Some("gif")
    else if (at(0) == 'B' && at(1) == 'M') Some("bmp")
    else if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) Some("jpeg")
    else None
  }

  /** The non-image decode stub: deterministic metadata derived from the
    * raw bytes. A real implementation would parse the container here.
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

  /** Real JDK decode: dimensions from `ImageIO.read`; GIF frame count from
    * the format reader (the one JDK still format with multi-frame
    * support). Undecodable bytes that sniffed as an image classify as
    * `<fmt>-corrupt` rather than silently falling back — corrupt media
    * must be visible to curation filters downstream.
    */
  private def decodeImage(bytes: Array[Byte], fmt: String): MediaMeta = {
    try {
      if (fmt == "gif") {
        val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
        try {
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext) return MediaMeta(bytes.length.toLong, 0, 0, 0, "gif-corrupt")
          val reader = readers.next()
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          val meta = MediaMeta(
            bytes.length.toLong, reader.getWidth(0), reader.getHeight(0), n, fmt)
          reader.dispose()
          meta
        } finally iis.close()
      } else {
        val img = ImageIO.read(new ByteArrayInputStream(bytes))
        if (img == null) MediaMeta(bytes.length.toLong, 0, 0, 0, s"$fmt-corrupt")
        else MediaMeta(bytes.length.toLong, img.getWidth, img.getHeight, 1, fmt)
      }
    } catch {
      case _: Exception => MediaMeta(bytes.length.toLong, 0, 0, 0, s"$fmt-corrupt")
    }
  }

  private def decodeAny(bytes: Array[Byte]): MediaMeta =
    sniffImageFormat(bytes) match {
      case Some(fmt) => decodeImage(bytes, fmt)
      case None => StubDecoder.decode(bytes)
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
    * columns. Sniffed image formats decode through `javax.imageio`
    * (REAL dimensions/frames); anything else takes the stub path.
    */
  def extractMeta(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val pruned = df.select(col(idCol), col(blobCol))
    val outSchema = StructType(pruned.schema.fields.take(1) ++ metaSchema.fields)
    pruned.mapPartitions { rows =>
      // per-partition decoder init happens here (ImageIO readers are
      // looked up per call; the registry scan is JVM-wide and warm)
      rows.map { r =>
        val meta = decodeAny(r.getAs[Array[Byte]](1))
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

  private val statsSchema = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_pixels", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false)))

  /** Per-channel integer pixel statistics from a REAL `ImageIO` decode —
    * the all-integers projection that lets a relational oracle replay the
    * decode of a generated fixture in closed form (the `m_image_stats`
    * gate). Non-image or corrupt blobs emit zero dims/sums with the
    * sniffed-or-`raw` format tag; lossless formats (png/bmp/gif) carry
    * exact sums, jpeg is lossy so only its dimensions are oracle-stable.
    */
  def imageStats(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val pruned = df.select(col(idCol), col(blobCol))
    val outSchema = StructType(pruned.schema.fields.take(1) ++ statsSchema.fields)
    pruned.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val fmt = sniffImageFormat(bytes)
        val img = fmt.flatMap { _ =>
          try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
          catch { case _: Exception => None }
        }
        img match {
          case Some(im) =>
            val (w, h) = (im.getWidth, im.getHeight)
            var (sr, sg, sb) = (0L, 0L, 0L)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = im.getRGB(x, y)
                sr += (rgb >> 16) & 0xff
                sg += (rgb >> 8) & 0xff
                sb += rgb & 0xff
                x += 1
              }
              y += 1
            }
            Row(r.get(0), fmt.get, w, h, w.toLong * h, sr, sg, sb)
          case None =>
            Row(r.get(0), fmt.getOrElse("raw"), 0, 0, 0L, 0L, 0L, 0L)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Deterministic PNG fixture: a `w`x`h` RGB image whose pixel `(x, y)`
    * is `((r0+x)%256, (g0+y)%256, b0)` — a gradient, so a passing gate
    * proves PER-PIXEL decode, not just header parsing. Channel sums have
    * the closed form the DuckDB oracle replays:
    * `sum_r = h*(w*r0 + w*(w-1)/2 - 256*GREATEST(0, r0+w-256))` (and
    * symmetrically for g over y; `sum_b = w*h*b0`).
    */
  def pngFixture(w: Int, h: Int, r0: Int, g0: Int, b0: Int): Array[Byte] = {
    require(w > 0 && h > 0, "fixture needs positive dimensions")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (((r0 + x) % 256) << 16) | (((g0 + y) % 256) << 8) | b0)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Stage a deterministic PNG blob per row from integer columns — the
    * fixture generator the media gates run DISTRIBUTED (partition-wise
    * encode; no driver materialization), mirroring how a real corpus
    * arrives with its blobs already in the rows.
    */
  def withPngBlob(
      df: DataFrame,
      idCol: String,
      w: org.apache.spark.sql.Column,
      h: org.apache.spark.sql.Column,
      r0: org.apache.spark.sql.Column,
      g0: org.apache.spark.sql.Column,
      b0: org.apache.spark.sql.Column): DataFrame = {
    val staged = df.select(
      col(idCol),
      w.cast(IntegerType).as("__w"),
      h.cast(IntegerType).as("__h"),
      r0.cast(IntegerType).as("__r0"),
      g0.cast(IntegerType).as("__g0"),
      b0.cast(IntegerType).as("__b0"))
    val outSchema = StructType(staged.schema.fields.take(1) :+
      StructField("blob", BinaryType, nullable = false))
    staged.mapPartitions { rows =>
      rows.map { r =>
        Row(
          r.get(0),
          pngFixture(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)))
      }
    }(Encoders.row(outSchema))
  }

  /** Stage a deterministic ANIMATED GIF per row (`nFrames` 6x4 frames,
    * frame i carrying pixel value i) — the multi-frame fixture the
    * m_frame_sample gate decodes back through the real JDK GIF reader.
    * Encode is partition-wise like [[withPngBlob]].
    */
  def withGifBlob(
      df: DataFrame,
      idCol: String,
      nFrames: org.apache.spark.sql.Column): DataFrame = {
    val staged = df.select(col(idCol), nFrames.cast(IntegerType).as("__n"))
    val outSchema = StructType(staged.schema.fields.take(1) :+
      StructField("blob", BinaryType, nullable = false))
    staged.mapPartitions { rows =>
      // one writer per PARTITION (the registry scan in
      // getImageWritersByFormatName is per-call overhead worth hoisting
      // at corpus scale); output is re-bound per row
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      rows.map { r =>
        val n = math.max(1, r.getInt(1))
        val bos = new ByteArrayOutputStream()
        val ios = ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var i = 0
        while (i < n) {
          val f = new java.awt.image.BufferedImage(
            6, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
          f.setRGB(0, 0, i)
          writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null)
          i += 1
        }
        writer.endWriteSequence()
        ios.close()
        Row(r.get(0), bos.toByteArray)
      }
    }(Encoders.row(outSchema))
  }

  /** Frame sampling: one output row per sampled frame (`every`-th frame),
    * each carrying a deterministic frame fingerprint — the video-curation
    * plumbing shape (explode-by-frame, partition-wise decode, no shuffle).
    * Frame COUNT comes from the real decode for JDK-decodable formats
    * (GIF is the multi-frame one) and the stub elsewhere; frame CONTENT
    * fingerprints stay byte-derived — the JDK has no video codecs, and a
    * real FFmpeg decoder would emit frame blobs here.
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
        val meta = decodeAny(bytes)
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

  /** Magic-byte sniff for the audio containers `javax.sound.sampled`
    * parses: RIFF/WAVE, AIFF (FORM/AIFF), AU (.snd).
    */
  def sniffAudioFormat(bytes: Array[Byte]): Option[String] = {
    def at(i: Int): Int = if (i < bytes.length) bytes(i) & 0xff else -1
    def tag(i: Int): String =
      if (i + 4 <= bytes.length) new String(bytes, i, 4, "US-ASCII") else ""
    if (tag(0) == "RIFF" && tag(8) == "WAVE") Some("wav")
    else if (tag(0) == "FORM" && (tag(8) == "AIFF" || tag(8) == "AIFC"))
      Some("aiff")
    else if (at(0) == '.' && at(1) == 's' && at(2) == 'n' && at(3) == 'd')
      Some("au")
    else None
  }

  /** Deterministic WAV fixture: `n` PCM16 mono samples at `sampleRate` Hz
    * where sample `i = ((i·k + 7) mod 65536) − 32768` — an integer
    * sawtooth, so a passing stats gate proves PER-SAMPLE decode (header
    * parsing alone cannot reproduce the absolute-amplitude sum). Encoded
    * through the real JDK WAV writer (`AudioSystem.write`, RIFF/WAVE
    * PCM_SIGNED little-endian).
    */
  def wavFixture(n: Int, k: Long, sampleRate: Int = 8000): Array[Byte] = {
    require(n > 0, "fixture needs at least one sample")
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      sampleRate.toFloat, 16, 1, 2, sampleRate.toFloat, false)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = (((i.toLong * k + 7L) % 65536L) - 32768L).toInt
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Stage a deterministic WAV blob per row from integer columns —
    * partition-wise encode like [[withPngBlob]] (the real JDK WAV writer
    * runs inside the task; no driver materialization).
    */
  def withWavBlob(
      df: DataFrame,
      idCol: String,
      n: org.apache.spark.sql.Column,
      k: org.apache.spark.sql.Column): DataFrame = {
    val staged = df.select(
      col(idCol),
      n.cast(IntegerType).as("__n"),
      k.cast(LongType).as("__k"))
    val outSchema = StructType(staged.schema.fields.take(1) :+
      StructField("blob", BinaryType, nullable = false))
    staged.mapPartitions { rows =>
      rows.map(r => Row(r.get(0), wavFixture(r.getInt(1), r.getLong(2))))
    }(Encoders.row(outSchema))
  }

  private val audioStatsSchema = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("sum_abs", LongType, nullable = false),
    StructField("max_amp", IntegerType, nullable = false)))

  /** Real JDK audio decode: container header (sample rate / channels /
    * bit depth / frame count) AND every PCM sample through
    * `javax.sound.sampled.AudioSystem` — integer amplitude statistics
    * (Σ|sample|, max |sample|) so a relational oracle can replay the
    * decode of a generated fixture exactly (the `m_audio_stats` gate).
    * Supports the PCM16 paths the JDK parses (WAV/AIFF/AU); non-audio or
    * corrupt blobs emit zero stats with the sniffed-or-`raw` tag —
    * corrupt media stays visible to curation filters, as in
    * [[decodeImage]]. Partition-wise, shuffle-free: the 100 TB posture
    * is identical to [[imageStats]].
    */
  def audioStats(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val pruned = df.select(col(idCol), col(blobCol))
    val outSchema = StructType(pruned.schema.fields.take(1) ++ audioStatsSchema.fields)
    pruned.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val fmt = sniffAudioFormat(bytes)
        val decoded = fmt.flatMap { tag =>
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new ByteArrayInputStream(bytes))
            try {
              val af = ais.getFormat
              if (af.getSampleSizeInBits != 16 ||
                af.getEncoding !=
                  javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
              else {
                val pcm = ais.readAllBytes()
                val nS = pcm.length / 2
                var (sumAbs, maxAmp) = (0L, 0)
                var i = 0
                while (i < nS) {
                  val lo = pcm(2 * i) & 0xff
                  val hi = pcm(2 * i + 1)
                  val v =
                    if (af.isBigEndian) ((pcm(2 * i) << 8) | (pcm(2 * i + 1) & 0xff))
                    else ((hi << 8) | lo)
                  val a = math.abs(v)
                  sumAbs += a
                  if (a > maxAmp) maxAmp = a
                  i += 1
                }
                Some(Row(
                  r.get(0), tag, af.getSampleRate.toInt, af.getChannels.toInt,
                  16, nS.toLong / af.getChannels, sumAbs, maxAmp))
              }
            } finally ais.close()
          } catch { case _: Exception => None }
        }
        decoded.getOrElse(
          Row(r.get(0), fmt.map(_ + "-corrupt").getOrElse("raw"),
            0, 0, 0, 0L, 0L, 0))
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
