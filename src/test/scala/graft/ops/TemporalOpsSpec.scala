package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def hist(rows: Seq[(Long, Long, String)]) =
    Scd.scd2History(
      rows.toDF("k", "ts", "attr"), Seq("k"), "attr", "ts", "ts")

  test("consecutive identical values collapse into one versioned run") {
    // key 1: a a b a  -> runs a(1..3), b(3..4), a(4..open)
    val out = hist(Seq(
      (1L, 1L, "a"), (1L, 2L, "a"), (1L, 3L, "b"), (1L, 4L, "a")))
      .orderBy("version").collect()
    out.map(r => (r.getAs[Int]("version"), r.getAs[String]("attr"),
      r.getAs[Long]("eff_from"))).toSeq shouldBe
      Seq((1, "a", 1L), (2, "b", 3L), (3, "a", 4L))
  }

  test("eff_to chains to the next run's eff_from; only the last row is open") {
    val out = hist(Seq(
      (1L, 10L, "x"), (1L, 20L, "y"), (1L, 30L, "z")))
      .orderBy("version").collect()
    out.map(_.getAs[Any]("eff_to")).toSeq shouldBe Seq(20L, 30L, null)
    out.map(_.getAs[Int]("is_current")).toSeq shouldBe Seq(0, 0, 1)
    // half-open chaining: version v's eff_to == version v+1's eff_from
    out.sliding(2).foreach { w =>
      w(0).getAs[Long]("eff_to") shouldBe w(1).getAs[Long]("eff_from")
    }
  }

  test("single observation yields one open version") {
    val out = hist(Seq((7L, 5L, "only"))).collect()
    out should have length 1
    out.head.getAs[Int]("version") shouldBe 1
    assert(out.head.isNullAt(out.head.fieldIndex("eff_to")))
    out.head.getAs[Int]("is_current") shouldBe 1
  }

  test("null attribute states are tracked null-safely") {
    // null -> a -> null: three runs, not a crash or a collapse
    val df = Seq[(Long, Long, Option[String])](
      (1L, 1L, None), (1L, 2L, None), (1L, 3L, Some("a")), (1L, 4L, None))
      .toDF("k", "ts", "attr")
    val out = Scd.scd2History(df, Seq("k"), "attr", "ts", "ts")
      .orderBy("version").collect()
    out.map(_.getAs[String]("attr")).toSeq shouldBe Seq(null, "a", null)
    out.map(_.getAs[Int]("version")).toSeq shouldBe Seq(1, 2, 3)
  }

  test("keys are independent and exactly one row per key is current") {
    val out = Scd.scd2History(
      Seq((1L, 1L, "a"), (2L, 1L, "a"), (1L, 2L, "b"), (2L, 2L, "a"))
        .toDF("k", "ts", "attr"),
      Seq("k"), "attr", "ts", "ts")
    out.filter(col("is_current") === 1).groupBy("k").count()
      .collect().map(_.getLong(1)).toSeq shouldBe Seq(1L, 1L)
    out.filter(col("k") === 2L).count() shouldBe 1L // no-change key: one run
  }

  test("equal timestamps order by the tie column") {
    val df = Seq((1L, 5L, 10L, "first"), (1L, 5L, 20L, "second"))
      .toDF("k", "ts", "tie", "attr")
    val out = Scd.scd2History(df, Seq("k"), "attr", "ts", "tie")
      .orderBy("version").collect()
    out.map(_.getAs[String]("attr")).toSeq shouldBe Seq("first", "second")
  }
}

class LatestSnapshotSpec extends SparkSpec {
  import spark.implicits._

  private val log = Seq(
    // (key, ts, tie, status, score)
    (1L, 10L, 1L, "a", 5.0),
    (1L, 20L, 2L, "b", 1.0), // latest for key 1 — whole row must win
    (2L, 10L, 3L, "a", 2.0),
    (2L, 30L, 4L, "del", 9.0), // tombstone: key 2 erased
    (3L, 10L, 5L, "c", 7.0))
    .toDF("k", "ts", "tie", "status", "score")

  private def snap = Scd.latestSnapshot(
    log, Seq("k"), "ts", "tie", col("status") === "del")

  test("latest observation wins atomically; tombstoned keys are erased") {
    val rows = snap.orderBy("k").collect()
    rows.map(_.getAs[Long]("k")).toSeq shouldBe Seq(1L, 3L)
    val r1 = rows.head
    r1.getAs[String]("status") shouldBe "b"
    r1.getAs[Double]("score") shouldBe 1.0 // from the winning row, not max
    r1.getAs[Long]("ts") shouldBe 20L
  }

  test("equal timestamps resolve by the tie column") {
    val df = Seq((1L, 5L, 1L, "x", 0.0), (1L, 5L, 2L, "y", 0.0))
      .toDF("k", "ts", "tie", "status", "score")
    Scd.latestSnapshot(df, Seq("k"), "ts", "tie", lit(false))
      .collect().head.getAs[String]("status") shouldBe "y"
  }

  test("a tombstone that is NOT the latest does not erase the key") {
    val df = Seq((1L, 10L, 1L, "del", 0.0), (1L, 20L, 2L, "alive", 0.0))
      .toDF("k", "ts", "tie", "status", "score")
    Scd.latestSnapshot(df, Seq("k"), "ts", "tie", col("status") === "del")
      .collect().head.getAs[String]("status") shouldBe "alive"
  }
}

class StreamingScdSpec extends SparkSpec {
  import spark.implicits._
  import graft.streaming.StreamingScd
  import graft.streaming.StreamingScd.Obs

  test("closed versions emit with batch-equivalent numbering across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Obs]
    val q = StreamingScd.history(input.toDS())
      .writeStream
      .format("memory")
      .queryName("scd_stream")
      .outputMode("append")
      .start()
    try {
      // batch 1: key 1 runs a(10..30), b(30..open); key 2 stays open
      input.addData(
        Obs(1L, 10L, 1L, "a"),
        Obs(1L, 20L, 2L, "a"),
        Obs(1L, 30L, 3L, "b"),
        Obs(2L, 10L, 4L, "z"))
      q.processAllAvailable()
      val r1 = spark.sql(
        "SELECT key, version, attr, eff_from_us, eff_to_us FROM scd_stream")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
          r.getLong(3), r.getLong(4)))
      r1.toSeq shouldBe Seq((1L, 1, "a", 10L, 30L))
      // batch 2: key 1's open b-run closes at 50 (version 2, eff_from from
      // batch-1 STATE); key 2's z-run closes at 40
      input.addData(Obs(1L, 50L, 5L, "c"), Obs(2L, 40L, 6L, "y"))
      q.processAllAvailable()
      val r2 = spark.sql(
        "SELECT key, version, attr, eff_from_us, eff_to_us FROM scd_stream " +
          "ORDER BY key, version")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
          r.getLong(3), r.getLong(4)))
      r2.toSeq shouldBe Seq(
        (1L, 1, "a", 10L, 30L),
        (1L, 2, "b", 30L, 50L),
        (2L, 1, "z", 10L, 40L))
    } finally q.stop()
  }

  test("cross-batch late arrivals are dropped, never corrupt the history") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Obs]
    val drops = spark.sparkContext.longAccumulator("scd2.lateDrops")
    val q = StreamingScd.history(input.toDS(), Some(drops))
      .writeStream
      .format("memory")
      .queryName("scd_late")
      .outputMode("append")
      .start()
    try {
      input.addData(
        Obs(1L, 100L, 1L, "a"), Obs(1L, 200L, 2L, "b"),
        Obs(1L, 250L, 3L, "b")) // advances the frontier past 200
      q.processAllAvailable()
      // LATE observations must not corrupt the history: us=50 predates
      // the open run entirely; us=220 lands INSIDE the open b-run
      // (before the 250 frontier) and would retro-split it
      input.addData(Obs(1L, 50L, 4L, "x"))
      q.processAllAvailable()
      input.addData(Obs(1L, 220L, 5L, "y"))
      q.processAllAvailable()
      input.addData(Obs(1L, 300L, 6L, "c")) // in-order close of the b run
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT version, attr, eff_from_us, eff_to_us FROM scd_late " +
          "ORDER BY version")
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
      rows.toSeq shouldBe Seq((1, "a", 100L, 200L), (2, "b", 200L, 300L))
      // the two late drops (us=50, us=220) are observable, not silent
      drops.value shouldBe 2L
    } finally q.stop()
  }

  test("streaming emission equals the batch history minus open runs") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(29)
    val obs = (1 to 400).map { i =>
      Obs(1L + rnd.nextInt(5), 10L * i, i.toLong,
        "s" + rnd.nextInt(3))
    }
    val input = MemoryStream[Obs]
    val q = StreamingScd.history(input.toDS())
      .writeStream
      .format("memory")
      .queryName("scd_stream_parity")
      .outputMode("append")
      .start()
    try {
      obs.grouped(97).foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table("scd_stream_parity")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
          r.getLong(3), r.getLong(4))).toSet
      val batch = Scd.scd2History(
        obs.toDF("key", "us", "tie", "attr"), Seq("key"), "attr", "us", "tie")
        .filter(col("eff_to").isNotNull)
        .collect().map(r => (r.getAs[Long]("key"), r.getAs[Int]("version"),
          r.getAs[String]("attr"), r.getAs[Long]("eff_from"),
          r.getAs[Long]("eff_to"))).toSet
      streamed shouldBe batch
    } finally q.stop()
  }
}

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  test("facts join the version whose half-open interval contains them") {
    // history for key 1: a@[10,30), b@[30,open)
    val obs = Seq((1L, 10L, 1L, "a"), (1L, 20L, 2L, "a"), (1L, 30L, 3L, "b"))
      .toDF("k", "ts", "tie", "attr")
    val hist = Scd.scd2History(obs, Seq("k"), "attr", "ts", "tie")
    val facts = Seq((101L, 1L, 15L), (102L, 1L, 30L), (103L, 1L, 99L),
      (104L, 1L, 5L)) // before any version: null enrichment
      .toDF("fact_id", "k", "ts")
    val out = AsOfJoin.leftAsOf(
      facts, "ts", hist, "eff_from",
      keys = Seq(("k", "k")),
      payload = Seq("version", "attr"),
      tieBreak = Some("version"))
      .orderBy("fact_id").collect()
    // 15 -> a(v1); 30 -> b(v2) AT its eff_from (half-open); 99 -> open b
    out.map(r => Option(r.getAs[Any]("attr")).orNull).toSeq shouldBe
      Seq("a", "b", "b", null)
    out.take(3).map(_.getAs[Int]("version")).toSeq shouldBe Seq(1, 2, 2)
  }
}

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def cov(rows: Seq[(Long, Long, Long)]) =
    Intervals.coverage(
      rows.zipWithIndex.map { case ((k, s, e), i) => (k, s, e, i.toLong) }
        .toDF("k", "s", "e", "tie"),
      Seq("k"), col("s"), col("e"), col("tie"))

  test("overlapping intervals merge; coverage counts each unit once") {
    // [0,10) + [5,15) overlap -> one island, covered 15 (not 20)
    val out = cov(Seq((1L, 0L, 10L), (1L, 5L, 15L))).collect()
    out.head.getAs[Long]("n_intervals") shouldBe 2L
    out.head.getAs[Long]("n_islands") shouldBe 1L
    out.head.getAs[Long]("covered") shouldBe 15L
  }

  test("half-open adjacency: touching intervals do not overlap") {
    // [0,3) + [3,5): two islands, covered 5, no double count at 3
    val out = cov(Seq((1L, 0L, 3L), (1L, 3L, 5L))).collect()
    out.head.getAs[Long]("n_islands") shouldBe 2L
    out.head.getAs[Long]("covered") shouldBe 5L
  }

  test("nested and duplicate intervals stay inside their island") {
    val out = cov(Seq(
      (1L, 0L, 100L), (1L, 10L, 20L), (1L, 10L, 20L), (1L, 200L, 210L)))
      .collect()
    out.head.getAs[Long]("n_intervals") shouldBe 4L
    out.head.getAs[Long]("n_islands") shouldBe 2L
    out.head.getAs[Long]("covered") shouldBe 110L
  }

  test("degenerate intervals (end <= start) are dropped") {
    val out = cov(Seq((1L, 5L, 5L), (1L, 9L, 3L), (1L, 0L, 2L))).collect()
    out.head.getAs[Long]("n_intervals") shouldBe 1L
    out.head.getAs[Long]("covered") shouldBe 2L
  }

  test("matches a brute-force point-set union on a seeded random fixture") {
    val rnd = new scala.util.Random(41)
    val rows = (1 to 200).map { _ =>
      val k = 1L + rnd.nextInt(3)
      val s = rnd.nextInt(50).toLong
      (k, s, s + 1L + rnd.nextInt(12))
    }
    val expected = rows.groupBy(_._1).map { case (k, iv) =>
      val pts = iv.flatMap { case (_, s, e) => s until e }.toSet
      // islands via an independent sweep: a new island opens when the next
      // interval shares NO point with the running one (half-open: s >= max)
      val islands = iv.map { case (_, s, e) => (s, e) }.sorted
        .foldLeft(0 -> Long.MinValue) { case ((n, mx), (s, e)) =>
          (if (s >= mx) n + 1 else n, math.max(mx, e))
        }._1
      k -> ((iv.size.toLong, islands.toLong, pts.size.toLong))
    }
    val got = cov(rows).collect().map { r =>
      r.getAs[Long]("k") -> ((r.getAs[Long]("n_intervals"),
        r.getAs[Long]("n_islands"), r.getAs[Long]("covered")))
    }.toMap
    got shouldBe expected
  }
}

class AudioSpec extends SparkSpec {
  import spark.implicits._

  private def sawtoothStats(n: Int, k: Long): (Long, Int) = {
    var (sum, mx) = (0L, 0)
    var i = 0
    while (i < n) {
      val a = math.abs((((i.toLong * k + 7L) % 65536L) - 32768L).toInt)
      sum += a; if (a > mx) mx = a
      i += 1
    }
    (sum, mx)
  }

  test("audioStats recovers header AND per-sample stats from a real WAV") {
    val (n, k) = (300, 12345L)
    val df = Seq((1L, Multimodal.wavFixture(n, k))).toDF("id", "blob")
    val out = Multimodal.audioStats(df, "id", "blob").collect().head
    val (sum, mx) = sawtoothStats(n, k)
    out.getAs[String]("format") shouldBe "wav"
    out.getAs[Int]("sample_rate") shouldBe 8000
    out.getAs[Int]("channels") shouldBe 1
    out.getAs[Int]("bits") shouldBe 16
    out.getAs[Long]("n_samples") shouldBe n.toLong
    out.getAs[Long]("sum_abs") shouldBe sum
    out.getAs[Int]("max_amp") shouldBe mx
  }

  test("per-sample stats match over 40 seeded fixtures (wrap boundaries)") {
    val rnd = new scala.util.Random(17)
    val cases = (1 to 40).map(_ => (8 + rnd.nextInt(600), 1L + rnd.nextInt(99999)))
    val df = cases.zipWithIndex.map { case ((n, k), i) =>
      (i.toLong, Multimodal.wavFixture(n, k))
    }.toDF("id", "blob")
    val out = Multimodal.audioStats(df, "id", "blob").orderBy("id").collect()
    cases.zip(out).foreach { case ((n, k), row) =>
      val (sum, mx) = sawtoothStats(n, k)
      withClue(s"n=$n k=$k: ") {
        row.getAs[Long]("n_samples") shouldBe n.toLong
        row.getAs[Long]("sum_abs") shouldBe sum
        row.getAs[Int]("max_amp") shouldBe mx
      }
    }
  }

  test("AIFF (big-endian PCM) decodes through the same path") {
    // re-encode the sawtooth PCM as AIFF via the JDK writer; the decoder's
    // isBigEndian branch must produce identical stats
    val (n, k) = (200, 777L)
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, true)
    val pcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val v = (((i.toLong * k + 7L) % 65536L) - 32768L).toInt
      pcm(2 * i) = ((v >> 8) & 0xff).toByte
      pcm(2 * i + 1) = (v & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.AIFF, bos)
    val df = Seq((1L, bos.toByteArray)).toDF("id", "blob")
    val out = Multimodal.audioStats(df, "id", "blob").collect().head
    val (sum, mx) = sawtoothStats(n, k)
    out.getAs[String]("format") shouldBe "aiff"
    out.getAs[Long]("sum_abs") shouldBe sum
    out.getAs[Int]("max_amp") shouldBe mx
  }

  test("non-audio bytes classify as raw; truncated WAV as wav-corrupt") {
    val wav = Multimodal.wavFixture(100, 3L)
    val df = Seq(
      (1L, "not audio at all".getBytes("UTF-8")),
      (2L, wav.take(16))) // RIFF/WAVE magic intact, body gone
      .toDF("id", "blob")
    val out = Multimodal.audioStats(df, "id", "blob").orderBy("id").collect()
    out(0).getAs[String]("format") shouldBe "raw"
    out(1).getAs[String]("format") shouldBe "wav-corrupt"
    out.foreach(_.getAs[Long]("n_samples") shouldBe 0L)
  }
}

class VideoSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Multimodal

  test("box walk recovers exactly the fixture's generating parameters") {
    val blob = Multimodal.mp4Fixture(
      timescale = 1000, durationTicks = 7340L, width = 640, height = 360,
      codec = "avc1", nAudio = 2, mdatLen = 256)
    val out = Multimodal.videoMeta(
      Seq((1L, blob)).toDF("id", "blob"), "id", "blob").collect().head
    out.getAs[String]("format") shouldBe "mp4"
    out.getAs[String]("major_brand") shouldBe "isom"
    out.getAs[Long]("duration_ms") shouldBe 7340L // ts 1000 -> ticks = ms
    out.getAs[Int]("n_tracks") shouldBe 3
    out.getAs[Int]("width") shouldBe 640
    out.getAs[Int]("height") shouldBe 360
    out.getAs[String]("codec") shouldBe "avc1"
  }

  test("parse matches the closed form over 40 seeded parameter draws") {
    val rnd = new scala.util.Random(41)
    (1 to 40).foreach { _ =>
      val ts = 100 + rnd.nextInt(48000)
      val dur = rnd.nextInt(1000000).toLong
      val (w, h) = (16 + rnd.nextInt(4000), 16 + rnd.nextInt(3000))
      val cc = Seq("avc1", "hvc1", "vp09", "av01")(rnd.nextInt(4))
      val na = rnd.nextInt(4)
      val m = Multimodal
        .parseMp4(Multimodal.mp4Fixture(ts, dur, w, h, cc, na, rnd.nextInt(100)))
        .get
      m.duration_ms shouldBe dur * 1000L / ts
      (m.n_tracks, m.width, m.height, m.codec) shouldBe ((1 + na, w, h, cc))
    }
  }

  test("64-bit version-1 mvhd durations parse too") {
    // splice a hand-built v1 mvhd (u64 times, u64 duration) into a v0
    // fixture's moov: fixture mvhd is 108 bytes at moov payload start
    val v0 = Multimodal.mp4Fixture(600, 4321L, 320, 240, "vp09", 0, 8)
    def be32(v: Long) = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long) = be32(v >> 32) ++ be32(v & 0xffffffffL)
    val body = Array[Byte](1, 0, 0, 0) ++ // version 1
      be64(0L) ++ be64(0L) ++ be32(600L) ++ be64(90000L) ++
      new Array[Byte](80) // rate..next_track_id, irrelevant to the parse
    val mvhd1 = be32(body.length + 8L) ++ "mvhd".getBytes("US-ASCII") ++ body
    val ftypLen = 8 + 12
    val moovStart = ftypLen // moov header at ftyp end
    val moovPayload = moovStart + 8
    val oldMvhdLen = 108
    val moovOldSize = ((v0(moovStart) & 0xff) << 24) |
      ((v0(moovStart + 1) & 0xff) << 16) |
      ((v0(moovStart + 2) & 0xff) << 8) | (v0(moovStart + 3) & 0xff)
    val newMoovSize = moovOldSize - oldMvhdLen + mvhd1.length
    val patched =
      v0.take(moovStart) ++ be32(newMoovSize.toLong) ++
        v0.slice(moovStart + 4, moovPayload) ++
        mvhd1 ++ v0.drop(moovPayload + oldMvhdLen)
    val m = Multimodal.parseMp4(patched).get
    m.duration_ms shouldBe 90000L * 1000L / 600L
    m.n_tracks shouldBe 1
    m.codec shouldBe "vp09"
  }

  test("box walk never throws or loops on 2000 adversarial mutations") {
    // the parser meets arbitrary bytes at corpus scale: every draw must
    // terminate in Some/None — no exception, no hang. Mutations cover
    // bit flips in size/type fields, truncations, zero-size boxes
    // (extend-to-end), 64-bit largesize markers, and pure garbage.
    val rnd = new scala.util.Random(163)
    val base = Multimodal.mp4Fixture(1000, 12345L, 320, 240, "avc1", 2, 64)
    (1 to 2000).foreach { i =>
      val b =
        if (i % 5 == 0) {
          val g = new Array[Byte](rnd.nextInt(200))
          rnd.nextBytes(g); g
        } else {
          val m = base.clone()
          (0 until 1 + rnd.nextInt(8)).foreach { _ =>
            m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
          }
          m.take(if (i % 3 == 0) rnd.nextInt(m.length + 1) else m.length)
        }
      noException should be thrownBy Multimodal.parseMp4(b)
    }
  }

  test("overflow-crafted largesize and v1 duration classify corrupt, no throw") {
    def be32(v: Long) = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    val ftyp = be32(20L) ++ "ftyp".getBytes("US-ASCII") ++
      "isom".getBytes("US-ASCII") ++ be32(0L) ++ "isom".getBytes("US-ASCII")
    // size0==1 + 64-bit largesize near Long.MaxValue: the additive bounds
    // check `off + size > limit` wraps negative and used to admit it,
    // driving off negative (AIOOBE) or a ~2^63-iteration loop. Must
    // classify mp4-corrupt instead (the exact advisor shape).
    Seq(Long.MaxValue, Long.MaxValue - 7L, Long.MinValue, -1L).foreach { ls =>
      val blob = ftyp ++ be32(1L) ++ "moov".getBytes("US-ASCII") ++ be64(ls) ++
        new Array[Byte](64)
      Multimodal.parseMp4(blob) shouldBe None
    }
    // v1 mvhd duration near Long.MaxValue: dur*1000 wraps; a positive
    // wrapped product must NOT surface as valid metadata
    Seq(Long.MaxValue, Long.MaxValue / 999L, Long.MinValue).foreach { dur =>
      val mvhdBody = Array[Byte](1, 0, 0, 0) ++
        be64(0L) ++ be64(0L) ++ be32(600L) ++ be64(dur) ++ new Array[Byte](80)
      val mvhd = be32(mvhdBody.length + 8L) ++
        "mvhd".getBytes("US-ASCII") ++ mvhdBody
      val moov = be32(mvhd.length + 8L) ++ "moov".getBytes("US-ASCII") ++ mvhd
      Multimodal.parseMp4(ftyp ++ moov) shouldBe None
    }
  }

  test("EBML walk recovers exactly the webm fixture's generating parameters") {
    val blob = Multimodal.webmFixture(
      scaleNs = 1000000L, durationUnits = 7340L, width = 640, height = 360,
      codec = "V_VP9", nAudio = 2, clusterLen = 256)
    val out = Multimodal.videoMeta(
      Seq((1L, blob)).toDF("id", "blob"), "id", "blob").collect().head
    out.getAs[String]("format") shouldBe "webm"
    out.getAs[String]("major_brand") shouldBe "webm" // DocType slot
    out.getAs[Long]("duration_ms") shouldBe 7340L // 1ms units
    out.getAs[Int]("n_tracks") shouldBe 3
    out.getAs[Int]("width") shouldBe 640
    out.getAs[Int]("height") shouldBe 360
    out.getAs[String]("codec") shouldBe "V_VP9"
  }

  test("webm parse matches the closed form over 40 seeded parameter draws") {
    val rnd = new scala.util.Random(43)
    (1 to 40).foreach { _ =>
      val sc = Seq(250000L, 500000L, 1000000L, 2000000L, 4000000L)(
        rnd.nextInt(5))
      val dur = rnd.nextInt(1000000).toLong
      val (w, h) = (16 + rnd.nextInt(4000), 16 + rnd.nextInt(3000))
      val cc = Seq("V_VP8", "V_VP9", "V_AV1")(rnd.nextInt(3))
      val na = rnd.nextInt(4)
      val m = Multimodal
        .parseWebm(
          Multimodal.webmFixture(sc, dur, w, h, cc, na, rnd.nextInt(100)))
        .get
      m.duration_ms shouldBe dur * sc / 1000000L
      (m.n_tracks, m.width, m.height, m.codec) shouldBe ((1 + na, w, h, cc))
    }
  }

  test("ebml walk never throws or loops on 2000 adversarial mutations") {
    // same contract as the mp4 fuzz: arbitrary bytes at corpus scale must
    // terminate in Some/None — bit flips, truncations, garbage; plus the
    // crafted-overflow shapes (unknown-size markers, huge vint sizes,
    // non-finite Duration floats) planted explicitly below
    val rnd = new scala.util.Random(167)
    val base = Multimodal.webmFixture(
      1000000L, 12345L, 320, 240, "V_VP9", 2, 64)
    (1 to 2000).foreach { i =>
      val b =
        if (i % 5 == 0) {
          val g = new Array[Byte](rnd.nextInt(200))
          rnd.nextBytes(g)
          // half the garbage draws keep the EBML magic so the walk runs
          if (i % 10 == 0 && g.length >= 4) {
            g(0) = 0x1a.toByte; g(1) = 0x45.toByte
            g(2) = 0xdf.toByte; g(3) = 0xa3.toByte
          }
          g
        } else {
          val m = base.clone()
          (0 until 1 + rnd.nextInt(8)).foreach { _ =>
            m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
          }
          m.take(if (i % 3 == 0) rnd.nextInt(m.length + 1) else m.length)
        }
      noException should be thrownBy Multimodal.parseWebm(b)
    }
  }

  test("webm overflow shapes classify corrupt: huge sizes, non-finite floats") {
    def id(v: Long, len: Int) = (0 until len)
      .map(i => ((v >> (8 * (len - 1 - i))) & 0xff).toByte).toArray
    val magic = id(0x1a45dfa3L, 4)
    // 8-byte vint size with all-ones (unknown) inside a child: extends to
    // parent end — must terminate, not loop
    val unknown = magic ++ Array(0x84.toByte) ++ // size 4
      id(0x4282L, 2) ++ Array(0x81.toByte, 'w'.toByte) ++
      id(0x18538067L, 4) ++ Array(0xff.toByte) ++ new Array[Byte](32)
    noException should be thrownBy Multimodal.parseWebm(unknown)
    // crafted 8-byte size near 2^56-2 inside a bounded parent: the
    // subtraction guard must reject without wrapping
    val hugeSz = Array(0x01.toByte) ++ Array.fill(6)(0xff.toByte) ++
      Array(0xfe.toByte)
    val crafted = magic ++ Array(0x90.toByte) ++ // EBML header claims 16
      id(0x4282L, 2) ++ hugeSz ++ new Array[Byte](8)
    Multimodal.parseWebm(crafted) shouldBe None
    // non-finite / out-of-range Duration doubles -> corrupt, not garbage
    Seq(Double.PositiveInfinity, Double.NaN, 9.3e15).foreach { d =>
      val bits = java.lang.Double.doubleToLongBits(d)
      val durEl = id(0x4489L, 2) ++ Array(0x88.toByte) ++ id(bits, 8)
      val scEl = id(0x2ad7b1L, 3) ++ Array(0x81.toByte, 0x01.toByte)
      val info = id(0x1549a966L, 4) ++
        Array((0x80 | (durEl.length + scEl.length)).toByte) ++ scEl ++ durEl
      val seg = id(0x18538067L, 4) ++
        Array((0x80 | info.length).toByte) ++ info
      val hdr = magic ++ Array(0x87.toByte) ++ // header payload = 7 bytes
        id(0x4282L, 2) ++ Array(0x84.toByte) ++ "webm".getBytes("US-ASCII")
      Multimodal.parseWebm(hdr ++ seg) shouldBe None
    }
  }

  test("oversized PixelWidth/PixelHeight classify corrupt, never truncate") {
    // a crafted 8-byte uint dimension would Int-truncate into plausible
    // garbage without the MaxPixelDim guard; sane dimensions still parse
    def id(v: Long, len: Int) = (0 until len)
      .map(i => ((v >> (8 * (len - 1 - i))) & 0xff).toByte).toArray
    def el(eid: Array[Byte], payload: Array[Byte]) =
      eid ++ Array((0x80 | payload.length).toByte) ++ payload
    def webmWith(width: Array[Byte]): Array[Byte] = {
      val video = el(id(0xe0L, 1), // Video
        el(id(0xb0L, 1), width) ++ // PixelWidth
          el(id(0xbaL, 1), id(48L, 2))) // PixelHeight
      val entry = el(id(0xaeL, 1), // TrackEntry
        el(id(0x83L, 1), Array(0x01.toByte)) ++ // TrackType = video
          el(id(0x86L, 1), "V_VP8".getBytes("US-ASCII")) ++ video)
      val tracks = el(id(0x1654ae6bL, 4), entry)
      val info = el(id(0x1549a966L, 4),
        el(id(0x2ad7b1L, 3), Array(0x01.toByte)) ++ // scale = 1 ns
          el(id(0x4489L, 2), id(
            java.lang.Double.doubleToLongBits(5.0e6), 8))) // Duration
      val seg = el(id(0x18538067L, 4), info ++ tracks)
      val hdr = el(id(0x1a45dfa3L, 4),
        el(id(0x4282L, 2), "webm".getBytes("US-ASCII")))
      hdr ++ seg
    }
    val sane = Multimodal.parseWebm(webmWith(id(640L, 2))).get
    sane.width shouldBe 640
    sane.height shouldBe 48
    // 2^33 exceeds MaxPixelDim; 0x8000000000000000 reads negative
    Multimodal.parseWebm(webmWith(id(1L << 33, 8))) shouldBe None
    Multimodal.parseWebm(webmWith(id(java.lang.Long.MIN_VALUE, 8))) shouldBe
      None
  }

  test("4-byte-float Duration elements parse too (fixture writes 8)") {
    def id(v: Long, len: Int) = (0 until len)
      .map(i => ((v >> (8 * (len - 1 - i))) & 0xff).toByte).toArray
    val fbits = java.lang.Float.floatToIntBits(90000.0f).toLong
    val durEl = id(0x4489L, 2) ++ Array(0x84.toByte) ++ id(fbits, 4)
    val scEl = id(0x2ad7b1L, 3) ++ Array(0x83.toByte) ++ id(500000L, 3)
    val info = id(0x1549a966L, 4) ++
      Array((0x80 | (durEl.length + scEl.length)).toByte) ++ scEl ++ durEl
    val seg = id(0x18538067L, 4) ++ Array((0x80 | info.length).toByte) ++ info
    val hdr = id(0x1a45dfa3L, 4) ++ Array(0x87.toByte) ++
      id(0x4282L, 2) ++ Array(0x84.toByte) ++ "webm".getBytes("US-ASCII")
    val m = Multimodal.parseWebm(hdr ++ seg).get
    m.duration_ms shouldBe 90000L * 500000L / 1000000L
    m.doc_type shouldBe "webm"
  }

  test("non-EBML after magic and truncated webm classify webm-corrupt") {
    val good = Multimodal.webmFixture(1000000L, 500L, 64, 48, "V_VP8", 1, 32)
    val df = Seq(
      (1L, good.take(30)), // magic intact, Segment truncated mid-element
      (2L, good.take(4) ++ Array.fill[Byte](8)(0x00))) // zero id byte
      .toDF("id", "blob")
    val out = Multimodal.videoMeta(df, "id", "blob").orderBy("id").collect()
    out.foreach { r =>
      r.getAs[String]("format") shouldBe "webm-corrupt"
      r.getAs[Int]("n_tracks") shouldBe 0
    }
  }

  test("non-BMFF bytes classify raw; truncated/garbled mp4 as mp4-corrupt") {
    val good = Multimodal.mp4Fixture(1000, 500L, 64, 48, "avc1", 1, 32)
    val df = Seq(
      (1L, "just some text".getBytes("UTF-8")),
      (2L, good.take(40)), // ftyp intact, moov truncated mid-box
      (3L, good.take(8) ++ Array.fill[Byte](8)(0x7f))) // absurd box size
      .toDF("id", "blob")
    val out = Multimodal.videoMeta(df, "id", "blob").orderBy("id").collect()
    out(0).getAs[String]("format") shouldBe "raw"
    out(1).getAs[String]("format") shouldBe "mp4-corrupt"
    out(2).getAs[String]("format") shouldBe "mp4-corrupt"
    out.foreach { r =>
      r.getAs[Int]("n_tracks") shouldBe 0
      r.getAs[Long]("duration_ms") shouldBe 0L
    }
  }
}
