package graft.http

import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec
import graft.http.testkit.StubServer

/** `json.fail-on-missing-field` — strict response decode (reference: the
  * json format option discovered by `discoverDecodingFormat`,
  * HttpLookupTableSourceFactory.java:103-112; docs spell it
  * `lookup-request.format.json.fail-on-missing-field`).
  *
  * Default decode is pinned PERMISSIVE: a drifted schema (endpoint stops
  * sending a declared field) silently nulls the column. Strict mode turns
  * exactly that drift into a loud job failure naming the field; null-VALUED
  * fields still pass (missing ≠ null, as in Flink).
  */
class StrictDecodeSpec extends SparkSpec with BeforeAndAfterAll {

  private var server: StubServer = _

  private val userSchema = StructType(Seq(
    StructField("name", StringType),
    StructField("balance", DoubleType)))

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = StubServer()
      .route("/full") { _ => (200, """{"name": "alice", "balance": 10.5}""") }
      .route("/drift") { _ => (200, """{"name": "alice"}""") }
      .route("/nullval") { _ => (200, """{"name": "alice", "balance": null}""") }
      .route("/drift-arr") { _ =>
        (200, """[{"name": "a", "balance": 1.0}, {"name": "b"}]""")
      }
      .start()
  }

  override def afterAll(): Unit = { server.stop(); super.afterAll() }

  private def probe = {
    import spark.implicits._
    Seq((1L, "42")).toDF("event", "id").repartition(1)
  }

  private def run(path: String, extra: (String, String)*): Array[org.apache.spark.sql.Row] =
    HttpLookup
      .join(
        probe,
        Seq("id"),
        userSchema,
        Map("url" -> server.url(path)) ++ extra)
      .collect()

  test("default PERMISSIVE decode nulls a drifted-away field") {
    val out = run("/drift")
    out should have size 1
    out.head.getAs[String]("name") shouldBe "alice"
    out.head.isNullAt(out.head.fieldIndex("balance")) shouldBe true
  }

  test("strict mode fails the job on a missing declared field, naming it") {
    val t = intercept[Throwable] {
      run("/drift", "json.fail-on-missing-field" -> "true")
    }
    val msgs = Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(16)
      .map(e => String.valueOf(e.getMessage)).mkString("\n")
    msgs should include("missing declared field")
    msgs should include("balance")
  }

  test("the reference-doc nested key spelling is honored too") {
    a[Throwable] should be thrownBy run(
      "/drift",
      "lookup-request.format.json.fail-on-missing-field" -> "true")
  }

  test("strict mode passes a complete body") {
    val out = run("/full", "json.fail-on-missing-field" -> "true")
    out should have size 1
    out.head.getAs[Double]("balance") shouldBe 10.5
  }

  test("a null-VALUED field is not a missing field") {
    val out = run("/nullval", "json.fail-on-missing-field" -> "true")
    out should have size 1
    out.head.isNullAt(out.head.fieldIndex("balance")) shouldBe true
  }

  test("array result-type: strict checks every element") {
    // default tolerates the drifted second element
    run(
      "/drift-arr",
      "http.source.lookup.result-type" -> "array") should have size 2
    a[Throwable] should be thrownBy run(
      "/drift-arr",
      "http.source.lookup.result-type" -> "array",
      "json.fail-on-missing-field" -> "true")
  }

  test("an undecodable body keeps UNABLE_TO_DESERIALIZE (strict does not preempt)") {
    val broken = StubServer().route("/broken") { _ => (200, "not json") }.start()
    try {
      val out = HttpLookup
        .join(
          probe,
          Seq("id"),
          userSchema,
          Map(
            "url" -> broken.url("/broken"),
            "json.fail-on-missing-field" -> "true"),
          includeMetadata = true)
        .collect()
      out should have size 1
      out.head.getAs[String](HttpLookup.MetaCompletionState) shouldBe
        CompletionState.UnableToDeserialize
    } finally broken.stop()
  }

  test("strict decode reaches the SQL TVF surface (option plumbing)") {
    graft.plans.GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1L, "42")).toDF("event", "id").createOrReplaceTempView("strict_probe")
    def tvf(path: String, strict: Boolean): String =
      s"""SELECT event, name, balance FROM http_lookup(
         |  'strict_probe', 'id', 'name STRING, balance DOUBLE',
         |  'url', '${server.url(path)}'${
           if (strict) ", 'json.fail-on-missing-field', 'true'" else ""}
         |)""".stripMargin
    // default: drift tolerated with a null column
    spark.sql(tvf("/drift", strict = false)).collect() should have size 1
    // strict: the same SQL fails loudly
    val t = intercept[Throwable] {
      spark.sql(tvf("/drift", strict = true)).collect()
    }
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(16)
      .map(e => String.valueOf(e.getMessage)).mkString("\n") should
      include("missing declared field")
    // strict over the complete endpoint still works
    spark.sql(tvf("/full", strict = true)).collect() should have size 1
  }

  test("csv format rejects the option (cannot enumerate record keys)") {
    an[HttpConfigException] should be thrownBy run(
      "/full",
      "format" -> "csv",
      "json.fail-on-missing-field" -> "true")
  }
}
