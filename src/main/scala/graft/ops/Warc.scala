package graft.ops

import java.io.ByteArrayInputStream
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (ISO 28500 / WARC 1.1) web-archive ingest — the container format
  * web-scale training corpora actually arrive in (Common Crawl ships
  * `.warc.gz`). The reference has no analog (it is HTTP-only); this is
  * the brief's ingest surface one format past JSONL: pure byte/text
  * arithmetic like [[Multimodal.parseMp4]], so a relational oracle can
  * replay the parse closed-form over generated fixtures.
  *
  * Supported subset: `WARC/1.0`/`1.1` records (named headers +
  * Content-Length-framed payload + CRLF CRLF record separator), plain or
  * per-record-gzip-member streams (the Common Crawl layout — JDK
  * `GZIPInputStream` reads concatenated members natively), HTTP response
  * payload split into status line / headers / body. Malformed structure
  * (bad version line, unparsable Content-Length, truncated payload,
  * decompression past [[MaxDecompressedBytes]]) classifies the whole
  * blob `warc-corrupt` — visible to curation filters downstream, never
  * an exception out of the job (the [[Multimodal]] contract).
  *
  * Scale posture: [[warcIngest]] is mapPartitions-only — one pass, zero
  * exchanges at any corpus size; one blob decodes in memory at a time
  * and the gzip cap bounds a decompression bomb to a per-row constant.
  */
object Warc {

  /** Decompression ceiling per blob: a crafted gzip bomb must classify
    * corrupt, not OOM an executor. 64 MiB is far above any sane
    * per-blob WARC segment at this plumbing's batch shape.
    */
  val MaxDecompressedBytes: Int = 64 << 20

  final case class WarcRecord(
      rec_idx: Int,
      warc_type: String,
      target_uri: String,
      http_status: Int,
      content_type: String,
      payload_len: Int,
      payload: String)

  private val Gzip = Array(0x1f.toByte, 0x8b.toByte)

  private def gunzipCapped(bytes: Array[Byte]): Option[Array[Byte]] =
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        if (out.size > MaxDecompressedBytes) return None // bomb: corrupt
        n = in.read(buf)
      }
      Some(out.toByteArray)
    } catch { case _: java.io.IOException => None }

  /** Parse a WARC blob (plain or gzip-member stream) into its records.
    * None = structurally corrupt. Response records surface their HTTP
    * status / Content-Type / body; other record types (warcinfo,
    * request, metadata) surface with status 0 and the raw payload.
    */
  def parseWarc(blob: Array[Byte]): Option[Seq[WarcRecord]] = {
    val bytes =
      if (blob.length >= 2 && blob(0) == Gzip(0) && blob(1) == Gzip(1))
        gunzipCapped(blob) match {
          case Some(b) => b
          case None => return None
        }
      else blob
    val out = Seq.newBuilder[WarcRecord]
    var off = 0
    var idx = 0
    def lineEnd(from: Int): Int = {
      var i = from
      while (i + 1 < bytes.length &&
        !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 < bytes.length) i else -1
    }
    while (off < bytes.length) {
      // tolerate trailing CRLFs between records
      while (off + 1 < bytes.length &&
        bytes(off) == '\r' && bytes(off + 1) == '\n') off += 2
      if (off >= bytes.length) return Some(out.result())
      val ve = lineEnd(off)
      if (ve < 0) return None
      val version = new String(bytes, off, ve - off, "US-ASCII")
      if (version != "WARC/1.0" && version != "WARC/1.1") return None
      var p = ve + 2
      var warcType = ""
      var uri = ""
      var len = -1L
      var done = false
      while (!done) {
        val he = lineEnd(p)
        if (he < 0) return None
        if (he == p) { p += 2; done = true } // blank line: headers end
        else {
          val line = new String(bytes, p, he - p, "US-ASCII")
          val ci = line.indexOf(':')
          if (ci < 0) return None
          val k = line.substring(0, ci).trim.toLowerCase
          val v = line.substring(ci + 1).trim
          k match {
            case "warc-type" => warcType = v
            case "warc-target-uri" => uri = v
            case "content-length" =>
              len = try v.toLong catch { case _: NumberFormatException => -1L }
            case _ => // date, record-id, content-type of the WARC block, …
          }
          p = he + 2
        }
      }
      if (len < 0L || len > bytes.length - p) return None
      val body = new String(bytes, p, len.toInt, "UTF-8")
      if (warcType == "response" && body.startsWith("HTTP/")) {
        // split the HTTP block: status line, headers, blank line, body
        val se = body.indexOf("\r\n")
        if (se < 0) return None
        val statusParts = body.substring(0, se).split(" ")
        val status = if (statusParts.length >= 2)
          try statusParts(1).toInt catch { case _: NumberFormatException => -1 }
        else -1
        if (status < 0) return None
        val hEnd = body.indexOf("\r\n\r\n")
        if (hEnd < 0) return None
        // hEnd < se + 2 when the status line is immediately followed by
        // the blank line (zero HTTP headers) — an empty header block
        val headerBlock =
          if (hEnd >= se + 2) body.substring(se + 2, hEnd) else ""
        val ct = headerBlock.split("\r\n")
          .map(_.split(":", 2))
          .collectFirst {
            case Array(k, v) if k.trim.equalsIgnoreCase("content-type") =>
              v.trim
          }
          .getOrElse("")
        val httpBody = body.substring(hEnd + 4)
        out += WarcRecord(
          idx, warcType, uri, status, ct, httpBody.length, httpBody)
      } else {
        out += WarcRecord(idx, warcType, uri, 0, "", body.length, body)
      }
      idx += 1
      off = p + len.toInt
      // records terminate with CRLF CRLF; at EOF the tail must still be a
      // (possibly truncated) prefix of that separator — 1-3 trailing
      // garbage bytes are structural corruption, not a clean end
      val sep = Array[Byte]('\r', '\n', '\r', '\n')
      val tail = math.min(4, bytes.length - off)
      var si = 0
      while (si < tail) {
        if (bytes(off + si) != sep(si)) return None
        si += 1
      }
      off += tail
    }
    Some(out.result())
  }

  private def record(
      typ: String,
      uri: String,
      block: String,
      contentType: String): Array[Byte] = {
    val body = block.getBytes("UTF-8")
    val hdr = new StringBuilder()
      .append("WARC/1.1\r\n")
      .append(s"WARC-Type: $typ\r\n")
      .append("WARC-Date: 2026-01-01T00:00:00Z\r\n")
      .append(s"WARC-Record-ID: <urn:uuid:fixed-for-determinism>\r\n")
    if (uri.nonEmpty) hdr.append(s"WARC-Target-URI: $uri\r\n")
    hdr
      .append(s"Content-Type: $contentType\r\n")
      .append(s"Content-Length: ${body.length}\r\n")
      .append("\r\n")
    hdr.toString.getBytes("US-ASCII") ++ body ++ "\r\n\r\n".getBytes("US-ASCII")
  }

  private def gzipMember(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(b); gz.close()
    bos.toByteArray
  }

  /** Deterministic structurally-real WARC fixture: one `warcinfo` record
    * + `nResponses` HTTP response records whose URI and body are closed
    * forms of `(seed, rec_idx)` — body = the letter `'a' + (seed+idx)%26`
    * repeated `16 + (seed*7+idx)%32` times. `gzip=true` emits each record
    * as its own gzip member (the Common Crawl `.warc.gz` layout).
    * [[parseWarc]] recovers exactly the generating parameters, so a
    * relational oracle replays the parse closed-form.
    */
  def warcFixture(seed: Long, nResponses: Int, gzip: Boolean): Array[Byte] = {
    require(nResponses >= 0, "nResponses must be non-negative")
    val info = record(
      "warcinfo", "", "software: graft-fixture\r\n", "application/warc-fields")
    val responses = (0 until nResponses).map { r =>
      val bodyLen = 16 + ((seed * 7 + r) % 32).toInt
      val letter = ('a' + ((seed + r) % 26).toInt).toChar
      val httpBody = letter.toString * bodyLen
      val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + httpBody
      record(
        "response",
        s"https://www.d${seed % 37}.com/p$seed-$r",
        http,
        "application/http; msgtype=response")
    }
    val records = info +: responses
    if (gzip) records.map(gzipMember).reduce(_ ++ _)
    else records.reduce(_ ++ _)
  }

  /** Stage a deterministic WARC blob per row — partition-wise encode like
    * [[Multimodal.withMp4Blob]]; odd ids gzip (both stream layouts in one
    * staged corpus).
    */
  def withWarcBlob(
      df: DataFrame,
      idCol: String,
      nResponses: org.apache.spark.sql.Column): DataFrame = {
    val staged = df.select(
      col(idCol).cast(LongType).as(idCol),
      nResponses.cast(IntegerType).as("__nr"))
    val outSchema = StructType(staged.schema.fields.take(1) :+
      StructField("blob", BinaryType, nullable = false))
    staged.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, warcFixture(id, r.getInt(1), gzip = id % 2L == 1L))
      }
    }(Encoders.row(outSchema))
  }

  private val ingestSchema = StructType(Seq(
    StructField("rec_idx", IntegerType, nullable = false),
    StructField("warc_type", StringType, nullable = false),
    StructField("target_uri", StringType, nullable = false),
    StructField("http_status", IntegerType, nullable = false),
    StructField("content_type", StringType, nullable = false),
    StructField("payload_len", IntegerType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  /** Ingest WARC blobs: one output row per record (mapPartitions, zero
    * exchanges at any corpus size). A corrupt blob surfaces as a single
    * `(id, -1, "warc-corrupt", …)` row — countable by curation filters,
    * never dropped silently and never an exception out of the job.
    */
  def warcIngest(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val pruned = df.select(col(idCol), col(blobCol))
    val outSchema =
      StructType(pruned.schema.fields.take(1) ++ ingestSchema.fields)
    pruned.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.get(0)
        parseWarc(r.getAs[Array[Byte]](1)) match {
          case Some(recs) => recs.map(w => Row(
            id, w.rec_idx, w.warc_type, w.target_uri, w.http_status,
            w.content_type, w.payload_len, w.payload))
          case None => Seq(Row(id, -1, "warc-corrupt", "", 0, "", 0, ""))
        }
      }
    }(Encoders.row(outSchema))
  }
}
