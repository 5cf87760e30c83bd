package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec
import graft.http.{HttpConfigException, Json}
import graft.http.testkit.StubServer

/** DSv2 sink table: batch save(), SQL CREATE TABLE + INSERT INTO, and
  * writeStream — the SQL-first sink surface the reference exposes via
  * `'connector'='http-async-sink'` DDL.
  */
class HttpSinkDataSourceSpec extends SparkSpec with BeforeAndAfterAll {

  private var server: StubServer = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = StubServer()
      .route("/ok") { _ => (200, "{}") }
      .start()
  }

  override def afterAll(): Unit = { server.stop(); super.afterAll() }

  private def df(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"name$i")).toDF("id", "name").coalesce(1)
  }

  test("df.write.format(graft-http-sink) posts JSON batches") {
    server.clear()
    df(25).write
      .format("graft-http-sink")
      .option("url", server.url("/ok"))
      .option("http.sink.request.batch.size", "10")
      .mode("append")
      .save()
    val bodies = server.requests.filter(_.path == "/ok").map(_.body)
    bodies should have size 3
    bodies.map(b => Json.mapper.readTree(b).size()).sorted shouldBe
      List(5, 10, 10)
    // submission is async: arrival order is not row order
    val rows = bodies.flatMap { b =>
      val arr = Json.mapper.readTree(b)
      (0 until arr.size()).map(arr.get)
    }
    rows.map(_.get("id").asLong()).toSet shouldBe (1L to 25L).toSet
    rows.find(_.get("id").asLong() == 1L).get
      .get("name").asText() shouldBe "name1"
  }

  test("SQL users can CREATE TABLE ... USING graft-http-sink and INSERT") {
    server.clear()
    spark.sql("DROP TABLE IF EXISTS http_out")
    spark.sql(
      s"""CREATE TABLE http_out (id BIGINT, name STRING)
         |USING `graft-http-sink`
         |OPTIONS (url '${server.url("/ok")}',
         |         `http.sink.request.batch.size` '100')""".stripMargin)
    try {
      spark.sql(
        "INSERT INTO http_out SELECT id, concat('n', id) FROM range(7)")
      val bodies = server.requests.filter(_.path == "/ok").map(_.body)
      bodies should not be empty
      val rows = bodies.flatMap { b =>
        val arr = Json.mapper.readTree(b)
        (0 until arr.size()).map(arr.get)
      }
      rows should have size 7
      rows.map(_.get("name").asText()).toSet should contain("n0")
    } finally spark.sql("DROP TABLE IF EXISTS http_out")
  }

  test("csv format renders one line per record with text/csv content type") {
    server.clear()
    df(3).write
      .format("graft-http-sink")
      .option("url", server.url("/ok"))
      .option("format", "csv")
      .mode("append")
      .save()
    val reqs = server.requests.filter(_.path == "/ok")
    reqs should have size 1
    reqs.head.body.split("\n").toSeq shouldBe
      Seq("1,name1", "2,name2", "3,name3")
    reqs.head.headers
      .getOrElse("Content-type", reqs.head.headers.getOrElse("Content-Type", Nil))
      .headOption.getOrElse("") should startWith("text/csv")
  }

  test("writeStream.format(graft-http-sink) posts each micro-batch") {
    server.clear()
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val q = mem.toDF().toDF("id")
      .writeStream
      .format("graft-http-sink")
      .option("url", server.url("/ok"))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-sink-ck").toString)
      .trigger(Trigger.AvailableNow())
    mem.addData(1L, 2L, 3L)
    val run = q.start()
    run.awaitTermination(30000)
    val rows = server.requests.filter(_.path == "/ok").flatMap { r =>
      val arr = Json.mapper.readTree(r.body)
      (0 until arr.size()).map(arr.get(_).get("id").asLong())
    }
    rows.toSet shouldBe Set(1L, 2L, 3L)
  }

  test("idempotency.sort plans the required ordering: keys replay-stable") {
    import spark.implicits._
    // two inserts of the same multiset in opposite input orders must frame
    // identical batches with identical idempotency keys — the write declares
    // RequiresDistributionAndOrdering, so SPARK plans the partition-local
    // sort; nothing here pre-sorts
    def run(rows: Seq[Long]): (List[String], List[String]) = {
      server.clear()
      rows.toDF("id").coalesce(1).write
        .format("graft-http-sink")
        .option("url", server.url("/ok"))
        .option("http.sink.request.batch.size", "4")
        .option("http.sink.idempotency.sort", "true")
        .option("http.sink.idempotency.header", "Idempotency-Key")
        .mode("append")
        .save()
      val reqs = server.requests.filter(_.path == "/ok")
      (
        reqs.map(_.body).sorted,
        reqs.flatMap(_.headers.getOrElse("Idempotency-key", Nil)).sorted)
    }
    val rows = Seq(6L, 1L, 9L, 4L, 2L, 8L, 3L)
    val (bodies, keys) = run(rows)
    bodies should have size 2
    keys should have size 2
    run(rows.reverse) shouldBe ((bodies, keys))
  }

  test("custom formats are rejected with a pointer at the Scala API") {
    // a REGISTERED custom format: resolvable, but its encode is a Column
    // tree needing analysis, which the DSv2 writer can't run
    graft.http.PayloadFormats.register(new graft.http.PayloadFormat {
      def name = "dsv2test"
      def contentType = "text/plain"
      def encode(record: org.apache.spark.sql.Column) =
        org.apache.spark.sql.functions.to_json(record)
      def decode(
          body: org.apache.spark.sql.Column,
          schema: org.apache.spark.sql.types.StructType,
          corruptField: String) =
        graft.http.JsonPayloadFormat.decode(body, schema, corruptField)
      def decodeArray(
          body: org.apache.spark.sql.Column,
          schema: org.apache.spark.sql.types.StructType,
          corruptField: String) = None
      def frameBatch(payloads: Seq[String]) = payloads.mkString("\n")
    })
    val e = intercept[HttpConfigException] {
      df(1).write
        .format("graft-http-sink")
        .option("url", server.url("/ok"))
        .option("format", "dsv2test")
        .mode("append")
        .save()
    }
    e.getMessage should include("HttpSink.write")

    val unknown = intercept[HttpConfigException] {
      df(1).write
        .format("graft-http-sink")
        .option("url", server.url("/ok"))
        .option("format", "nope")
        .mode("append")
        .save()
    }
    unknown.getMessage should include("Unknown payload format")
  }
}
