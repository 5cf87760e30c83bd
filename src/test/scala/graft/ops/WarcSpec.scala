package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WarcSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Warc

  test("parse recovers exactly the fixture's generating parameters") {
    Seq(false, true).foreach { gz =>
      val recs = Warc.parseWarc(Warc.warcFixture(42L, 3, gzip = gz)).get
      recs.length shouldBe 4
      recs.head.warc_type shouldBe "warcinfo"
      recs.head.payload shouldBe "software: graft-fixture\r\n"
      recs.tail.zipWithIndex.foreach { case (r, i) =>
        r.warc_type shouldBe "response"
        r.target_uri shouldBe s"https://www.d5.com/p42-$i"
        r.http_status shouldBe 200
        r.content_type shouldBe "text/html"
        val expLen = 16 + ((42L * 7 + i) % 32).toInt
        r.payload_len shouldBe expLen
        r.payload shouldBe ('a' + ((42L + i) % 26).toInt).toChar.toString * expLen
      }
    }
  }

  test("plain and gzip-member streams parse identically over seeded draws") {
    val rnd = new scala.util.Random(59)
    (1 to 30).foreach { _ =>
      val seed = rnd.nextLong().abs % 100000L
      val n = rnd.nextInt(5)
      val plain = Warc.parseWarc(Warc.warcFixture(seed, n, gzip = false))
      val gz = Warc.parseWarc(Warc.warcFixture(seed, n, gzip = true))
      plain shouldBe gz
      plain.get.length shouldBe n + 1
    }
  }

  test("fuzz: 2000 adversarial mutations terminate in Some/None, no throw") {
    val rnd = new scala.util.Random(171)
    val basePlain = Warc.warcFixture(7L, 2, gzip = false)
    val baseGz = Warc.warcFixture(7L, 2, gzip = true)
    (1 to 2000).foreach { i =>
      val b =
        if (i % 5 == 0) {
          val g = new Array[Byte](rnd.nextInt(300))
          rnd.nextBytes(g)
          // half the garbage draws keep the WARC/gzip leaders so the
          // parser walks instead of rejecting at byte 0
          if (i % 10 == 0 && g.length >= 9)
            "WARC/1.1\r".getBytes("US-ASCII").copyToArray(g)
          else if (g.length >= 2) { g(0) = 0x1f.toByte; g(1) = 0x8b.toByte }
          g
        } else {
          val m = (if (i % 2 == 0) basePlain else baseGz).clone()
          (0 until 1 + rnd.nextInt(8)).foreach { _ =>
            m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
          }
          m.take(if (i % 3 == 0) rnd.nextInt(m.length + 1) else m.length)
        }
      noException should be thrownBy Warc.parseWarc(b)
    }
  }

  test("trailing bytes after the last record must prefix CRLF CRLF") {
    val good = Warc.warcFixture(9L, 2, gzip = false)
    // the fixture ends with the full CRLF CRLF separator: dropping 1-3
    // of those bytes leaves a truncated-but-valid separator prefix
    (1 to 3).foreach { k =>
      Warc.parseWarc(good.dropRight(k)).map(_.length) shouldBe Some(3)
    }
    // 1-3 trailing GARBAGE bytes are structural corruption, not a clean
    // end (the pre-r16 parser silently accepted them)
    Seq("x", "\r\nx", "\r\nZ\r").foreach { tail =>
      Warc.parseWarc(
        good.dropRight(4) ++ tail.getBytes("US-ASCII")) shouldBe None
    }
    // garbage AT the separator position with >=4 bytes left still rejects
    Warc.parseWarc(good.dropRight(4) ++ "XXXX".getBytes("US-ASCII")) shouldBe
      None
  }

  test("a gzip bomb classifies corrupt instead of exhausting memory") {
    // ~160 MB of zeros compresses to ~160 KB: decompression must stop at
    // the MaxDecompressedBytes cap and classify the blob corrupt
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    val chunk = new Array[Byte](1 << 20)
    (0 until 160).foreach(_ => gz.write(chunk))
    gz.close()
    bos.size should be < (1 << 20) // the bomb itself is small on the wire
    Warc.parseWarc(bos.toByteArray) shouldBe None
  }

  test("structural corruption classifies, valid neighbors still ingest") {
    val good = Warc.warcFixture(3L, 1, gzip = false)
    val df = Seq(
      (1L, good),
      (2L, good.take(20)), // version line intact, headers truncated
      (3L, "HTTP/1.1 200 OK\r\n\r\n".getBytes("US-ASCII")), // not WARC
      (4L, { // Content-Length larger than the remaining bytes
        val s = new String(good, "US-ASCII")
        s.replaceFirst("Content-Length: \\d+", "Content-Length: 99999")
          .getBytes("US-ASCII")
      }))
      .toDF("id", "blob")
    val out = Warc.warcIngest(df, "id", "blob")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n"),
        max(when(col("warc_type") === "warc-corrupt", 1).otherwise(0))
          .as("corrupt"))
      .orderBy("id")
      .collect()
    out.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq shouldBe
      Seq((1L, 2L, 0), (2L, 1L, 1), (3L, 1L, 1), (4L, 1L, 1))
  }

  test("warcIngest is gate-shaped: one row per record, atomic columns") {
    val staged = Warc.withWarcBlob(
      Seq(10L, 11L, 12L).toDF("doc_id"), "doc_id",
      nResponses = lit(1) + col("doc_id") % 3)
    val out = Warc.warcIngest(staged, "doc_id", "blob")
    out.count() shouldBe (3 + (1 + 10 % 3) + (1 + 11 % 3) + (1 + 12 % 3))
    out.filter(col("warc_type") === "warc-corrupt").count() shouldBe 0L
    // odd ids staged as gzip members: same schema, same closed forms
    out.filter(col("doc_id") === 11 && col("warc_type") === "response")
      .select(col("payload_len"))
      .collect()
      .map(_.getInt(0))
      .toSeq shouldBe (0 until 3).map(r => 16 + ((11 * 7 + r) % 32))
  }
}
