package graft.ops

import java.io.{BufferedInputStream, ByteArrayInputStream, InputStream, PushbackInputStream}
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
  * Two ingest grains, one parser:
  *   - [[warcIngest]] over a BLOB column (a segment already staged into a
  *     binary cell): the blob is the atomic unit — any structural error
  *     classifies the whole blob corrupt. mapPartitions-only, one blob in
  *     memory at a time, gzip capped at [[MaxDecompressedBytes]].
  *   - [[warcIngestFiles]] over FILE paths (the real-world arrival shape:
  *     multi-GB `.warc.gz` segments): records STREAM off the file handle
  *     one at a time — peak task memory is one record's payload (capped
  *     at [[MaxRecordBytes]], enforced BEFORE the payload is read) plus a
  *     64 KiB stream buffer, regardless of file size. Gzip is not
  *     splittable, so one file = one task; cluster parallelism comes from
  *     the file count, which is how the format ships (Common Crawl
  *     publishes ~64k segment files per crawl).
  */
object Warc {

  /** Decompression ceiling per blob: a crafted gzip bomb must classify
    * corrupt, not OOM an executor. 64 MiB is far above any sane
    * per-blob WARC segment at this plumbing's batch shape.
    */
  val MaxDecompressedBytes: Int = 64 << 20

  /** Per-record payload ceiling on the FILE path. A file legitimately
    * decompresses to many GB in total, so the bound that keeps executor
    * memory flat is per RECORD: a Content-Length above this classifies
    * the stream corrupt BEFORE any payload byte is read or buffered.
    */
  val MaxRecordBytes: Int = 64 << 20

  /** Header-line ceiling for the record walk — a WARC named header (or a
    * crafted line with no CRLF for gigabytes) may not buffer unboundedly.
    */
  val MaxHeaderLineBytes: Int = 64 * 1024

  final case class WarcRecord(
      rec_idx: Int,
      warc_type: String,
      target_uri: String,
      http_status: Int,
      content_type: String,
      payload_len: Int,
      payload: String)

  private val Gzip = Array(0x1f.toByte, 0x8b.toByte)
  private val Sep = Array[Byte]('\r', '\n', '\r', '\n')

  private[ops] def gunzipCapped(bytes: Array[Byte]): Option[Array[Byte]] =
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

  /** Head window a pruned walk reads per record to split the HTTP block:
    * status line + headers must terminate within it (256 KiB dwarfs any
    * sane header block); the rest of the payload is stream-skipped.
    */
  val HttpHeadBytes: Int = 256 * 1024

  private def indexOfSeq(
      hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = from
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  private val HttpMagic = "HTTP/".getBytes("US-ASCII")
  private val Crlf = Array[Byte]('\r', '\n')

  /** Split a record's framed payload into the surfaced fields, working on
    * BYTES so a pruned walk can pass just the payload head: response
    * records with an HTTP block yield status / Content-Type / body-byte
    * count, every other type surfaces raw with status 0. `head` holds the
    * first `min(totalLen, head.length)` payload bytes; `payload_len` is
    * always a BYTE count (`totalLen` minus the HTTP head, or `totalLen`
    * raw), identical whether or not the body was materialized. The body
    * STRING is decoded only when `includePayload` (and is the possibly
    * truncated head slice if the head window did not cover the payload —
    * pruned callers never read it). None = malformed HTTP block.
    */
  private def buildRecord(
      idx: Int,
      warcType: String,
      uri: String,
      head: Array[Byte],
      totalLen: Long,
      includePayload: Boolean): Option[WarcRecord] =
    if (warcType == "response" && head.length >= HttpMagic.length &&
      indexOfSeq(head, HttpMagic, 0) == 0) {
      // split the HTTP block: status line, headers, blank line, body
      val se = indexOfSeq(head, Crlf, 0)
      if (se < 0) return None
      val statusParts =
        new String(head, 0, se, "US-ASCII").split(" ")
      val status = if (statusParts.length >= 2)
        try statusParts(1).toInt catch { case _: NumberFormatException => -1 }
      else -1
      if (status < 0) return None
      val hEnd = indexOfSeq(head, Sep, 0)
      // the terminator must sit inside the head window — an HTTP header
      // block past HttpHeadBytes (or missing entirely) is malformed
      if (hEnd < 0) return None
      // hEnd < se + 2 when the status line is immediately followed by
      // the blank line (zero HTTP headers) — an empty header block
      val headerBlock = if (hEnd >= se + 2)
        new String(head, se + 2, hEnd - (se + 2), "US-ASCII")
      else ""
      val ct = headerBlock.split("\r\n")
        .map(_.split(":", 2))
        .collectFirst {
          case Array(k, v) if k.trim.equalsIgnoreCase("content-type") =>
            v.trim
        }
        .getOrElse("")
      val bodyBytes = (totalLen - (hEnd + 4)).toInt
      val body = if (includePayload)
        new String(head, hEnd + 4, head.length - (hEnd + 4), "UTF-8")
      else ""
      Some(WarcRecord(idx, warcType, uri, status, ct, bodyBytes, body))
    } else {
      val body = if (includePayload) new String(head, "UTF-8") else ""
      Some(WarcRecord(idx, warcType, uri, 0, "", totalLen.toInt, body))
    }

  /** Incremental record walk over a byte stream — THE parser; the blob
    * path wraps decompressed bytes in a ByteArrayInputStream, the file
    * path hands it the (possibly gzip-member) file stream directly. Each
    * `next()` buffers at most one record: header lines capped at
    * [[MaxHeaderLineBytes]], the payload at [[MaxRecordBytes]] (checked
    * against the declared Content-Length BEFORE reading it).
    *
    * `next()`: `Some(Right(rec))` = one record; `Some(Left(reason))` =
    * structural corruption (terminal — the walk stops); `None` = clean
    * EOF (which per the r16 tail rule requires any bytes after the last
    * record to be a prefix of the CRLF CRLF separator).
    */
  /** Positional buffered reader for the record walk (r16, guide §1.2
    * per-task work): the header loop previously issued one virtual
    * `InputStream.read()` per byte through two stream layers — ~10⁸
    * dispatches on a Common Crawl segment, measured at roughly the same
    * cost as the gzip inflate itself. This reader owns a flat byte
    * buffer and scans it positionally (JIT-friendly array loops); ALL
    * parser reads go through it so stream position stays exact.
    */
  private final class ByteReader(in: InputStream) {
    private val buf = new Array[Byte](64 * 1024)
    private var pos = 0
    private var lim = 0

    /** Refill; returns false at EOF. */
    private def fill(): Boolean = {
      if (pos < lim) return true
      val n = in.read(buf)
      if (n <= 0) return false
      pos = 0
      lim = n
      true
    }

    def read(): Int =
      if (pos < lim || fill()) { val b = buf(pos) & 0xff; pos += 1; b }
      else -1

    /** Read exactly `len` bytes into `dst` unless EOF; returns count. */
    def readFully(dst: Array[Byte], len: Int): Int = {
      var got = 0
      while (got < len) {
        if (pos < lim) {
          val take = math.min(len - got, lim - pos)
          System.arraycopy(buf, pos, dst, got, take)
          pos += take
          got += take
        } else {
          // bulk-read the remainder straight from the stream when it
          // exceeds one buffer fill (payload bodies)
          val n = in.read(dst, got, len - got)
          if (n <= 0) return got
          got += n
        }
      }
      got
    }

    /** Skip exactly `n` bytes unless EOF; returns count skipped. */
    def skipFully(n: Long): Long = {
      var done = 0L
      while (done < n) {
        if (pos < lim) {
          val take = math.min(n - done, (lim - pos).toLong).toInt
          pos += take
          done += take
        } else if (!fill()) return done
      }
      done
    }

    /** One CRLF-terminated US-ASCII line (terminator consumed, not
      * returned); `first` is a byte already consumed by the caller.
      * Byte-identical logic to the r15 loop — only the byte source
      * changed (flat-buffer read instead of layered stream reads) and
      * the accumulator (plain array instead of a synchronized BAOS).
      */
    def readLine(first: Int): Either[String, String] = {
      var line = new Array[Byte](128)
      var n = 0
      var prev = -1
      var b = first
      while (true) {
        if (b == -1) return Left("eof-in-header")
        if (prev == '\r' && b == '\n')
          return Right(new String(line, 0, n - 1, "US-ASCII"))
        if (n == line.length)
          line = java.util.Arrays.copyOf(line, line.length * 2)
        line(n) = b.toByte
        n += 1
        if (n > MaxHeaderLineBytes) return Left("header-line-too-long")
        prev = b
        b = read()
      }
      Left("unreachable")
    }
  }

  private final class StreamParser(in: InputStream, includePayload: Boolean) {
    private var idx = 0
    private var done = false
    private val rdr = new ByteReader(in)

    private def readLine(first: Int): Either[String, String] =
      rdr.readLine(first)

    def next(): Option[Either[String, WarcRecord]] = {
      if (done) return None
      def fail(reason: String): Option[Either[String, WarcRecord]] = {
        done = true
        Some(Left(reason))
      }
      // tolerate CRLF pairs between records; clean EOF may land here
      var b = rdr.read()
      while (b == '\r') {
        if (rdr.read() != '\n') return fail("stray-cr-between-records")
        b = rdr.read()
      }
      if (b == -1) { done = true; return None }
      val version = readLine(b) match {
        case Left(r) => return fail(r)
        case Right(v) => v
      }
      if (version != "WARC/1.0" && version != "WARC/1.1")
        return fail("bad-version-line")
      var warcType = ""
      var uri = ""
      var len = -1L
      var headersDone = false
      while (!headersDone) {
        readLine(rdr.read()) match {
          case Left(r) => return fail(r)
          case Right("") => headersDone = true
          case Right(line) =>
            val ci = line.indexOf(':')
            if (ci < 0) return fail("header-without-colon")
            val k = line.substring(0, ci).trim.toLowerCase
            val v = line.substring(ci + 1).trim
            k match {
              case "warc-type" => warcType = v
              case "warc-target-uri" => uri = v
              case "content-length" =>
                len =
                  try v.toLong
                  catch { case _: NumberFormatException => -1L }
              case _ => // date, record-id, block content-type, …
            }
        }
      }
      // the no-OOM guarantee: reject BEFORE allocating/reading a payload
      // the cap forbids — a 2 GB Content-Length never materializes
      if (len < 0L) return fail("bad-content-length")
      if (len > MaxRecordBytes) return fail("record-too-large")
      // payload pruning pushed into the walk: a metadata-only ingest
      // reads just the head window (enough for the HTTP split) and
      // stream-skips the body — the decompressor still advances, but no
      // body array, String decode, or row payload is ever built
      val headLen =
        if (includePayload) len.toInt
        else math.min(len, HttpHeadBytes.toLong).toInt
      val head = new Array[Byte](headLen)
      if (rdr.readFully(head, headLen) != headLen)
        return fail("truncated-payload")
      if (rdr.skipFully(len - headLen) != len - headLen)
        return fail("truncated-payload")
      // records terminate with CRLF CRLF; EOF mid-separator is a clean
      // end iff the bytes present match a prefix of it (the tail rule)
      var si = 0
      var sepDone = false
      while (si < 4 && !sepDone) {
        val sb = rdr.read()
        if (sb == -1) { done = true; sepDone = true }
        else if (sb != Sep(si)) return fail("bad-record-separator")
        else si += 1
      }
      buildRecord(idx, warcType, uri, head, len, includePayload) match {
        case Some(rec) => idx += 1; Some(Right(rec))
        case None => fail("bad-http-block")
      }
    }
  }

  /** Parse a WARC blob (plain or gzip-member stream) into its records.
    * None = structurally corrupt — the blob is the atomic unit, so ANY
    * error voids it whole. Response records surface their HTTP status /
    * Content-Type / body; other record types (warcinfo, request,
    * metadata) surface with status 0 and the raw payload.
    */
  def parseWarc(blob: Array[Byte]): Option[Seq[WarcRecord]] = {
    val bytes =
      if (blob.length >= 2 && blob(0) == Gzip(0) && blob(1) == Gzip(1))
        gunzipCapped(blob) match {
          case Some(b) => b
          case None => return None
        }
      else blob
    val parser =
      new StreamParser(new ByteArrayInputStream(bytes), includePayload = true)
    val out = Seq.newBuilder[WarcRecord]
    var step = parser.next()
    while (step.isDefined) {
      step.get match {
        case Right(rec) => out += rec
        case Left(_) => return None
      }
      step = parser.next()
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

  private def gzipMember(b: Array[Byte]): Array[Byte] =
    gzipMember(b, java.util.zip.Deflater.DEFAULT_COMPRESSION)

  private def gzipMember(b: Array[Byte], level: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos) {
      this.`def`.setLevel(level)
    }
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

  /** Stage one HTTP-response WARC blob per row whose body is the given
    * TEXT column (UTF-8) — the crawl-chain fixture grain:
    * [[withWarcBlob]] generates synthetic letter bodies, this carries
    * REAL corpus payloads through the container so an e2e chain
    * (ingest → strip → filter → dedup) starts at the arrival format.
    * Each blob = warcinfo + one response; odd ids ship as per-record
    * gzip members (both stream layouts in one staged corpus).
    */
  def withWarcBlobBody(
      df: DataFrame,
      idCol: String,
      bodyCol: String): DataFrame = {
    // Par.fan: the per-row work downstream (gzip encode, then typically a
    // full parse + strip chain) is heavy, and a small-extract input would
    // otherwise pin it to a handful of scan partitions
    val staged = Par.fan(df.select(
      col(idCol).cast(LongType).as(idCol),
      col(bodyCol).cast(StringType).as("__body")))
    val outSchema = StructType(staged.schema.fields.take(1) :+
      StructField("blob", BinaryType, nullable = false))
    staged.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val http = "HTTP/1.1 200 OK\r\n" +
          "Content-Type: text/html; charset=utf-8\r\n\r\n" + r.getString(1)
        val info = record(
          "warcinfo", "", "software: graft-fixture\r\n",
          "application/warc-fields")
        val resp = record(
          "response",
          s"https://www.d${id % 37}.com/p$id",
          http,
          "application/http; msgtype=response")
        Row(id,
          if (id % 2L == 1L) gzipMember(info) ++ gzipMember(resp)
          else info ++ resp)
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

  /** Stream the records of one archive FILE (plain `.warc` or
    * multi-member `.warc.gz`, sniffed by magic bytes) through the Hadoop
    * FileSystem API — local paths and cluster filesystems alike. Emitted
    * lazily: `Right(record)` per record; on structural corruption or an
    * I/O failure, ONE terminal `Left(reason)` after the records already
    * streamed (a stream cannot retract emitted output, so unlike the
    * atomic blob grain a file surfaces its valid prefix + a corrupt
    * marker). The stream closes itself at exhaustion or terminal error.
    */
  private[graft] def probeFileRecords(
      path: String,
      includePayload: Boolean): Iterator[Either[String, WarcRecord]] =
    fileRecords(path, includePayload)

  private def fileRecords(
      path: String,
      includePayload: Boolean): Iterator[Either[String, WarcRecord]] = {
    var in: InputStream = null
    val parser: Either[String, StreamParser] =
      try {
        val hp = new org.apache.hadoop.fs.Path(path)
        val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val raw = new BufferedInputStream(fs.open(hp), 64 * 1024)
        val pb = new PushbackInputStream(raw, 2)
        in = pb
        val head = new Array[Byte](2)
        val n = pb.read(head)
        if (n > 0) pb.unread(head, 0, n)
        val stream =
          if (n == 2 && head(0) == Gzip(0) && head(1) == Gzip(1)) {
            // re-buffer ABOVE the inflater: the header walk reads single
            // bytes, and an unbuffered GZIPInputStream.read() pays an
            // inflater call per byte (~6× slower end-to-end, measured)
            val gz = new BufferedInputStream(
              new GZIPInputStream(pb, 64 * 1024), 64 * 1024)
            in = gz
            gz
          } else pb
        Right(new StreamParser(stream, includePayload))
      } catch {
        case _: java.io.IOException =>
          if (in != null) { try in.close() catch { case _: Exception => } }
          Left("warc-open-failed")
      }
    def closeQuietly(): Unit =
      if (in != null) { try in.close() catch { case _: Exception => } }

    new Iterator[Either[String, WarcRecord]] {
      private var pending: Option[Either[String, WarcRecord]] =
        parser match {
          case Left(reason) => Some(Left(reason))
          case Right(p) => pull(p)
        }
      private def pull(
          p: StreamParser): Option[Either[String, WarcRecord]] = {
        val step =
          try p.next()
          catch { case _: java.io.IOException => Some(Left("warc-io-error")) }
        if (step.isEmpty || step.get.isLeft) closeQuietly()
        step
      }
      override def hasNext: Boolean = pending.isDefined
      override def next(): Either[String, WarcRecord] = {
        val out = pending.get
        pending =
          if (out.isLeft) None // terminal: corruption ends the file walk
          else parser.toOption.flatMap(pull)
        out
      }
    }
  }

  /** FILE-scale WARC ingest — the arrival grain of a real crawl dump:
    * point it at `.warc(.gz)` paths and every record streams out as a
    * row, without the file (or even one whole member run) materializing
    * in memory. Input: any DataFrame with a path column; all OTHER
    * columns pass through onto each emitted row (carry a stable file key
    * there — paths are machine-local). Output: passthrough columns +
    * the [[warcIngest]] record columns. Structural corruption mid-file
    * emits the valid record prefix, then ONE `(…, -1, "warc-corrupt", …)`
    * marker row, then stops that file.
    *
    * Scale posture: one shuffle of the (tiny) path relation spreads
    * files across tasks — gzip is not splittable, so one file = one task
    * and cluster parallelism comes from the file COUNT (the Common
    * Crawl shape: ~64k segment files per crawl, ~1 GB each). Peak task
    * memory is one record payload (≤ [[MaxRecordBytes]], enforced
    * against the declared Content-Length before the payload is read)
    * plus a 64 KiB stream buffer — a 10 GB segment and a 10 MB segment
    * cost the same RAM.
    *
    * `includePayload = false` is COLUMN PRUNING pushed into the record
    * walk: metadata-grain consumers (URL frontiers, status/length
    * audits) get every column except the body string — the walk reads
    * only each record's [[HttpHeadBytes]] head for the HTTP split and
    * stream-skips the body, so no body array, UTF-8 decode, or row
    * string is ever built (~2× wall on the 293 MiB fixture, and far
    * less row volume downstream). `payload_len` is byte-exact in both
    * modes; corruption classification is mode-independent.
    */
  def warcIngestFiles(
      df: DataFrame,
      pathCol: String,
      includePayload: Boolean = true): DataFrame = {
    val others = df.schema.fields.filterNot(_.name == pathCol).toSeq
    val pruned =
      df.select(others.map(f => col(f.name)) :+ col(pathCol): _*)
    val outSchema = StructType(others ++ ingestSchema.fields)
    val nKeep = others.length
    pruned
      .repartition(col(pathCol))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val keep = (0 until nKeep).map(r.get)
          fileRecords(r.getString(nKeep), includePayload).map {
            case Right(w) => Row.fromSeq(keep ++ Seq(
              w.rec_idx, w.warc_type, w.target_uri, w.http_status,
              w.content_type, w.payload_len, w.payload))
            case Left(_) =>
              Row.fromSeq(keep ++ Seq(-1, "warc-corrupt", "", 0, "", 0, ""))
          }
        }
      }(Encoders.row(outSchema))
  }

  // ---- deterministic FILE fixtures ---------------------------------
  //
  // The blob fixture's repeated-letter bodies deflate ~20×, so a gzip
  // fixture FILE of real size would need tens of millions of records.
  // The file fixture instead draws printable-ASCII bodies from an LCG —
  // ~6.6 bits/char of entropy keeps each gzip member near its input
  // size, so a ≥256 MiB on-wire file needs only ~10⁵ records. Length,
  // URI and bucket aggregates stay closed-form (oracle-replayable);
  // the byte-exact CONTENT is replayed in-gate by [[fileBody]].

  /** Closed-form body length of file-fixture response `r`: 2048..4095. */
  def fileBodyLen(seed: Long, r: Int): Int =
    2048 + ((seed * 31 + r * 97L) % 2048).toInt

  /** Closed-form target URI of file-fixture response `r`. */
  def fileUri(seed: Long, r: Int): String =
    s"https://www.d${(seed + r) % 37}.com/seg$seed/p$r"

  /** Deterministic printable-ASCII body of file-fixture response `r` —
    * an LCG draw per char (codes 33..126), replayable for in-gate
    * byte-exact probes.
    */
  def fileBody(seed: Long, r: Int): String = {
    val len = fileBodyLen(seed, r)
    val out = new Array[Byte](len)
    var x = seed * 0x9e3779b97f4a7c15L + r * 0xc2b2ae3d27d4eb4fL +
      0x165667b19e3779f9L
    var i = 0
    while (i < len) {
      x = x * 6364136223846793005L + 1442695040888963407L
      out(i) = (33 + ((x >>> 33) % 94).toInt).toByte
      i += 1
    }
    new String(out, "US-ASCII")
  }

  /** Stream a deterministic archive FILE to `path`: one `warcinfo` +
    * `nResponses` HTTP responses with [[fileBody]] payloads, each record
    * its own gzip member when `gzip` (the Common Crawl layout). Written
    * via a temp file + atomic rename so a crashed writer never leaves a
    * half-fixture behind. Returns the on-wire file length.
    */
  def writeWarcFile(
      path: String,
      seed: Long,
      nResponses: Int,
      gzip: Boolean): Long = {
    require(nResponses >= 0, "nResponses must be non-negative")
    val f = new java.io.File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    val tmp = new java.io.File(
      f.getParentFile, f.getName + ".tmp-" + java.util.UUID.randomUUID())
    val os = new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(tmp), 1 << 16)
    try {
      // BEST_SPEED: the bodies are near-incompressible by construction,
      // so higher levels only burn fixture-staging time (measured ~2×)
      def emit(rec: Array[Byte]): Unit =
        os.write(
          if (gzip) gzipMember(rec, java.util.zip.Deflater.BEST_SPEED)
          else rec)
      emit(record(
        "warcinfo", "", "software: graft-fixture\r\n",
        "application/warc-fields"))
      var r = 0
      while (r < nResponses) {
        val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
          fileBody(seed, r)
        emit(record(
          "response", fileUri(seed, r), http,
          "application/http; msgtype=response"))
        r += 1
      }
    } finally os.close()
    if (!tmp.renameTo(f)) {
      // a concurrent writer won the rename: its bytes are identical
      tmp.delete()
      if (!f.exists()) {
        throw new java.io.IOException(s"could not stage fixture at $path")
      }
    }
    f.length()
  }

  /** Memoized fixture staging: the file is fully deterministic in its
    * parameters, so one write per machine serves every JVM (Verify,
    * Bench, tests). Lives under the JVM temp dir (override with
    * `-Dgraft.work.dir=`); the name encodes the parameters + a format
    * version so a generator change can never reuse stale bytes.
    */
  def stagedWarcFile(
      name: String,
      seed: Long,
      nResponses: Int,
      gzip: Boolean): java.io.File = {
    val dir = new java.io.File(
      sys.props.getOrElse("graft.work.dir", sys.props("java.io.tmpdir")),
      "graft-warc-fixtures")
    val ext = if (gzip) ".warc.gz" else ".warc"
    val f = new java.io.File(dir, s"${name}_v1_s${seed}_n$nResponses$ext")
    if (!f.isFile || f.length() == 0L)
      writeWarcFile(f.getPath, seed, nResponses, gzip)
    f
  }
}
