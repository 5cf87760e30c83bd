package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Structured Streaming coverage: watermarked tumbling windows (SURVEY Q11)
  * and session windows (Q9's streaming form) — the streaming analog of the
  * batch event queries the driver gates.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("watermarked tumbling-window aggregation over an event stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = input
      .toDF()
      .toDF("ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("sv"))
      .select($"window.start".as("ws"), $"event_type", $"n", $"sv")
    val q = agg.writeStream
      .format("memory")
      .queryName("ev_hourly")
      .outputMode("append")
      .start()
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:45:00"), "click", 2.0),
        (ts("2024-01-01 10:50:00"), "view", 5.0))
      q.processAllAvailable()
      // advance the watermark past the 10:00 window to force emission
      input.addData((ts("2024-01-01 12:30:00"), "click", 9.0))
      q.processAllAvailable()
      val rows = spark
        .sql("SELECT * FROM ev_hourly ORDER BY ws, event_type")
        .collect()
      rows.map(r =>
        (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSeq shouldBe Seq(
        ("2024-01-01 10:00:00.0", "click", 2L, 3.0),
        ("2024-01-01 10:00:00.0", "view", 1L, 5.0))
    } finally q.stop()
  }

  test("session windows (30 min gap) over a keyed event stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val sessions = input
      .toDF()
      .toDF("ts", "user_id")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select(
        $"session_window.start".as("ss"),
        $"session_window.end".as("se"),
        $"user_id",
        $"n_events")
    val q = sessions.writeStream
      .format("memory")
      .queryName("sessions")
      .outputMode("append")
      .start()
    try {
      input.addData(
        (ts("2024-01-01 09:00:00"), 1L),
        (ts("2024-01-01 09:10:00"), 1L), // same session (gap 10m < 30m)
        (ts("2024-01-01 10:30:00"), 1L), // new session (gap 80m)
        (ts("2024-01-01 09:00:00"), 2L))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 13:00:00"), 99L)) // advance watermark
      q.processAllAvailable()
      val rows = spark
        .sql("SELECT user_id, n_events FROM sessions WHERE user_id < 99 ORDER BY user_id, n_events DESC")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSeq
      rows shouldBe Seq((1L, 2L), (1L, 1L), (2L, 1L))
    } finally q.stop()
  }

  test("approx_count_distinct tracks exact distinct within tolerance (Q7 sketch path)") {
    val df = spark.range(100000).select((col("id") % 7919).as("k"))
    val approx =
      df.agg(approx_count_distinct($"k", 0.02).as("a")).collect().head.getLong(0)
    approx.toDouble shouldBe 7919.0 +- (7919 * 0.05)
  }

  test("streaming exact dedup: dropDuplicatesWithinWatermark on content hash") {
    // the streaming face of Dedup.exact: same md5 content key, state
    // bounded by the watermark instead of a full-corpus shuffle
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val deduped = input
      .toDF()
      .toDF("ts", "doc_id", "text")
      .withColumn("fp", md5($"text"))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("fp")
    val q = deduped.writeStream
      .format("memory")
      .queryName("stream_dedup")
      .outputMode("append")
      .start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, "same text"),
        (ts("2024-01-01 10:01:00"), 2L, "same text"),
        (ts("2024-01-01 10:02:00"), 3L, "other text"))
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM stream_dedup")
        .collect().map(_.getLong(0)).toSet
      ids should have size 2
      ids should contain(3L)
      // exactly one of the two duplicates survived
      (ids.contains(1L) ^ ids.contains(2L)) shouldBe true
    } finally q.stop()
  }
}
