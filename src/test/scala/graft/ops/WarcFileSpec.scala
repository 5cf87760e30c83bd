package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** FILE-scale WARC ingest: records must STREAM off multi-member
  * `.warc.gz` files under bounded memory — the Common Crawl arrival
  * grain the blob path (capped at 64 MiB decompressed) cannot serve.
  */
class WarcFileSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Warc

  private def tmpDir(): java.io.File = {
    val d = java.nio.file.Files
      .createTempDirectory("graft-warcfile-spec").toFile
    d.deleteOnExit()
    d
  }

  test("file ingest recovers the closed forms, gzip and plain alike") {
    val dir = tmpDir()
    Seq(true, false).foreach { gz =>
      val p = new java.io.File(dir, s"t1-$gz").getPath
      Warc.writeWarcFile(p, seed = 5L, nResponses = 7, gzip = gz)
      val out = Warc
        .warcIngestFiles(Seq(("f", p)).toDF("fid", "path"), "path")
        .orderBy("rec_idx")
        .collect()
      out.length shouldBe 8
      out.head.getAs[String]("warc_type") shouldBe "warcinfo"
      out.tail.zipWithIndex.foreach { case (r, i) =>
        r.getAs[String]("fid") shouldBe "f"
        r.getAs[String]("warc_type") shouldBe "response"
        r.getAs[String]("target_uri") shouldBe Warc.fileUri(5L, i)
        r.getAs[Int]("http_status") shouldBe 200
        r.getAs[Int]("payload_len") shouldBe Warc.fileBodyLen(5L, i)
        r.getAs[String]("payload") shouldBe Warc.fileBody(5L, i)
      }
    }
  }

  test("a record beyond MaxRecordBytes classifies corrupt without OOM") {
    // the header DECLARES 2 GiB; the file itself is a few hundred bytes.
    // The parser must reject on the declared length BEFORE reading any
    // payload — materializing it is impossible here, which is the proof
    val dir = tmpDir()
    val p = new java.io.File(dir, "huge-decl").getPath
    val hdr = ("WARC/1.1\r\nWARC-Type: resource\r\n" +
      s"Content-Length: ${2L * 1024 * 1024 * 1024}\r\n\r\n")
      .getBytes("US-ASCII")
    val os = new java.io.FileOutputStream(p)
    try { os.write(hdr); os.write("abc".getBytes("US-ASCII")) }
    finally os.close()
    val out = Warc
      .warcIngestFiles(Seq(("f", p)).toDF("fid", "path"), "path")
      .collect()
    out.length shouldBe 1
    out.head.getAs[String]("warc_type") shouldBe "warc-corrupt"
    out.head.getAs[Int]("rec_idx") shouldBe -1
  }

  test("mid-file corruption: valid prefix survives + one marker row") {
    val dir = tmpDir()
    val p = new java.io.File(dir, "midcorrupt").getPath
    val good = Warc.warcFixture(3L, 2, gzip = false)
    val os = new java.io.FileOutputStream(p)
    try { os.write(good); os.write("NOT A WARC RECORD".getBytes("US-ASCII")) }
    finally os.close()
    val out = Warc
      .warcIngestFiles(Seq(("f", p)).toDF("fid", "path"), "path")
      .orderBy("rec_idx")
      .collect()
    // 3 valid records streamed, then the terminal corrupt marker
    out.map(_.getAs[Int]("rec_idx")).toSeq shouldBe Seq(-1, 0, 1, 2)
    out.count(_.getAs[String]("warc_type") == "warc-corrupt") shouldBe 1
  }

  test("a missing path surfaces as a corrupt row, not a task failure") {
    val out = Warc
      .warcIngestFiles(
        Seq(("f", "/nonexistent/graft/no.warc.gz")).toDF("fid", "path"),
        "path")
      .collect()
    out.map(r => (r.getAs[String]("warc_type"), r.getAs[Int]("rec_idx")))
      .toSeq shouldBe Seq(("warc-corrupt", -1))
  }

  test("many files in one relation all ingest; passthrough cols survive") {
    val dir = tmpDir()
    val files = (0 until 6).map { i =>
      val p = new java.io.File(dir, s"seg-$i").getPath
      Warc.writeWarcFile(p, seed = i.toLong, nResponses = 3 + i % 3,
        gzip = i % 2 == 0)
      (s"seg-$i", i, p)
    }
    val out = Warc
      .warcIngestFiles(files.toDF("fid", "k", "path"), "path")
    out.filter(col("warc_type") === "warc-corrupt").count() shouldBe 0L
    val perFile = out
      .filter(col("warc_type") === "response")
      .groupBy("fid", "k")
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[String]("fid"), r.getAs[Int]("k"),
        r.getAs[Long]("n")))
      .toSet
    perFile shouldBe (0 until 6)
      .map(i => (s"seg-$i", i, (3 + i % 3).toLong)).toSet
  }

  test("pruned walk: every column except payload identical, payload empty") {
    val dir = tmpDir()
    val files = Seq(true, false).zipWithIndex.map { case (gz, i) =>
      val p = new java.io.File(dir, s"pr-$i").getPath
      Warc.writeWarcFile(p, seed = 20L + i, nResponses = 6, gzip = gz)
      (s"pr-$i", p)
    }
    val paths = files.toDF("fid", "path")
    val full = Warc.warcIngestFiles(paths, "path")
    val pruned = Warc.warcIngestFiles(paths, "path", includePayload = false)
    pruned.filter(col("payload") =!= "").count() shouldBe 0L
    val meta = (df: org.apache.spark.sql.DataFrame) => df
      .drop("payload").orderBy("fid", "rec_idx").collect().toSeq
    meta(pruned) shouldBe meta(full)
    // byte-exact payload_len in BOTH modes (the r16 byte semantics)
    full.filter(col("warc_type") === "response")
      .select(col("fid"), col("rec_idx"), col("payload_len")).collect()
      .foreach { r =>
        val seed = 20L + r.getAs[String]("fid").drop(3).toInt
        r.getAs[Int]("payload_len") shouldBe
          Warc.fileBodyLen(seed, r.getAs[Int]("rec_idx") - 1)
      }
  }

  test("stagedWarcFile memoizes: second call reuses identical bytes") {
    val d = java.nio.file.Files
      .createTempDirectory("graft-warcfile-staged").toFile
    val prev = sys.props.get("graft.work.dir")
    sys.props("graft.work.dir") = d.getPath
    try {
      val f1 = Warc.stagedWarcFile("spec", seed = 11L, nResponses = 5,
        gzip = true)
      val len1 = f1.length()
      val mtime = f1.lastModified()
      val f2 = Warc.stagedWarcFile("spec", seed = 11L, nResponses = 5,
        gzip = true)
      f2.getPath shouldBe f1.getPath
      f2.length() shouldBe len1
      f2.lastModified() shouldBe mtime // not rewritten
    } finally {
      prev match {
        case Some(v) => sys.props("graft.work.dir") = v
        case None => sys.props.remove("graft.work.dir")
      }
    }
  }

  test("tail rule holds on files too: trailing garbage marks corrupt") {
    val dir = tmpDir()
    val p = new java.io.File(dir, "tail").getPath
    val good = Warc.warcFixture(9L, 1, gzip = false)
    val os = new java.io.FileOutputStream(p)
    try { os.write(good.dropRight(4)); os.write("\r\nxx".getBytes) }
    finally os.close()
    val out = Warc
      .warcIngestFiles(Seq(("f", p)).toDF("fid", "path"), "path")
      .collect()
    out.count(_.getAs[String]("warc_type") == "warc-corrupt") shouldBe 1
  }
}
