package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.http.testkit.StubServer

class HttpPollingSourceSpec extends SparkSpec {

  private def checkpoint() =
    Files.createTempDirectory("graft-poll-ckpt").toString

  test("polls endpoint and splits JSON array into rows") {
    val server = new StubServer()
      .route("/feed")(_ => (200, """[{"id":1},{"id":2},{"id":3}]"""))
      .start()
    try {
      val df = spark.readStream
        .format("graft-http-poll")
        .option("url", server.url("/feed"))
        .load()
      val q = df.writeStream
        .format("memory")
        .queryName("poll_feed")
        .option("checkpointLocation", checkpoint())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000) shouldBe true
      val rows = spark
        .sql("SELECT poll_id, item_index, status, body FROM poll_feed ORDER BY item_index")
        .collect()
      rows.length shouldBe 3
      rows.map(_.getLong(0)).toSet shouldBe Set(1L)
      rows.map(_.getInt(1)).toSeq shouldBe Seq(0, 1, 2)
      rows.map(_.getInt(2)).toSet shouldBe Set(200)
      rows.head.getString(3) shouldBe """{"id":1}"""
      server.requestCount shouldBe 1
    } finally server.stop()
  }

  test("split-array=false keeps the whole body as one row") {
    val server = new StubServer()
      .route("/one")(_ => (200, """[1,2,3]"""))
      .start()
    try {
      val df = spark.readStream
        .format("graft-http-poll")
        .option("url", server.url("/one"))
        .option("split-array", "false")
        .load()
      val q = df.writeStream
        .format("memory")
        .queryName("poll_one")
        .option("checkpointLocation", checkpoint())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000) shouldBe true
      val rows = spark.sql("SELECT body FROM poll_one").collect()
      rows.length shouldBe 1
      rows.head.getString(0) shouldBe "[1,2,3]"
    } finally server.stop()
  }

  test("continuous trigger polls repeatedly, one batch per poll") {
    val counter = new java.util.concurrent.atomic.AtomicInteger()
    val server = new StubServer()
      .route("/seq")(_ => (200, s"""{"n":${counter.incrementAndGet()}}"""))
      .start()
    try {
      val df = spark.readStream
        .format("graft-http-poll")
        .option("url", server.url("/seq"))
        .load()
      val q = df.writeStream
        .format("memory")
        .queryName("poll_seq")
        .option("checkpointLocation", checkpoint())
        .trigger(Trigger.ProcessingTime(25))
        .start()
      try {
        val deadline = System.currentTimeMillis() + 60000
        var polls = 0L
        while (polls < 3 && System.currentTimeMillis() < deadline) {
          Thread.sleep(50)
          polls = spark.sql("SELECT count(DISTINCT poll_id) FROM poll_seq")
            .collect().head.getLong(0)
        }
        polls should be >= 3L
        val bodies = spark
          .sql("SELECT body FROM poll_seq WHERE poll_id <= 3 ORDER BY poll_id")
          .collect().map(_.getString(0))
        bodies.take(3) shouldBe Array("{\"n\":1}", "{\"n\":2}", "{\"n\":3}")
      } finally q.stop()
    } finally server.stop()
  }

  test("non-success response does not advance the offset (no rows emitted)") {
    val server = new StubServer()
      .route("/down")(_ => (404, "not found"))
      .start()
    try {
      val df = spark.readStream
        .format("graft-http-poll")
        .option("url", server.url("/down"))
        .load()
      val q = df.writeStream
        .format("memory")
        .queryName("poll_down")
        .option("checkpointLocation", checkpoint())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000) shouldBe true
      spark.sql("SELECT * FROM poll_down").collect() shouldBe empty
    } finally server.stop()
  }
}
