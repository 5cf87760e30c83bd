package graft.http

import java.net.URI
import java.net.http.{HttpRequest, HttpResponse}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.http.testkit.{ProxyServer, StubServer}

/** End-to-end proxy traversal (reference: `utils/ProxyConfig` + docs
  * `http.source.lookup.proxy.*` options) against a real in-process forward
  * proxy — not just config wiring.
  */
class ProxySpec extends SparkSpec {

  private val responseSchema = StructType(Seq(StructField("v", StringType)))

  test("client factory routes through an unauthenticated proxy") {
    val origin = new StubServer().route("/data")(_ => (200, """{"v":"hi"}""")).start()
    val proxy = new ProxyServer().start()
    try {
      val client = HttpClientFactory.build(HttpClientFactory.ClientConfig(
        proxyHost = Some(proxy.host),
        proxyPort = Some(proxy.port)))
      val resp = client.send(
        HttpRequest.newBuilder(URI.create(origin.url("/data"))).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      resp.statusCode() shouldBe 200
      resp.body() shouldBe """{"v":"hi"}"""
      resp.headers().firstValue("Via").orElse("") should include("graft-proxy")
      proxy.requestCount shouldBe 1
      proxy.requests.head.target shouldBe origin.url("/data")
      origin.requestCount shouldBe 1
    } finally { proxy.stop(); origin.stop() }
  }

  test("proxy basic auth: 407 challenge then authenticated retry") {
    val origin = new StubServer().route("/data")(_ => (200, """{"v":"ok"}""")).start()
    val proxy = new ProxyServer(requireUser = Some(("pxuser", "pxpass"))).start()
    try {
      val client = HttpClientFactory.build(HttpClientFactory.ClientConfig(
        proxyHost = Some(proxy.host),
        proxyPort = Some(proxy.port),
        proxyUsername = Some("pxuser"),
        proxyPassword = Some("pxpass")))
      val resp = client.send(
        HttpRequest.newBuilder(URI.create(origin.url("/data"))).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      resp.statusCode() shouldBe 200
      resp.body() shouldBe """{"v":"ok"}"""
      // first attempt unauthorized, retry carries Proxy-Authorization
      proxy.requests.map(_.authorized) shouldBe List(false, true)
    } finally { proxy.stop(); origin.stop() }
  }

  test("wrong proxy credentials stay 407") {
    val origin = new StubServer().route("/data")(_ => (200, """{"v":"ok"}""")).start()
    val proxy = new ProxyServer(requireUser = Some(("pxuser", "pxpass"))).start()
    try {
      val client = HttpClientFactory.build(HttpClientFactory.ClientConfig(
        proxyHost = Some(proxy.host),
        proxyPort = Some(proxy.port),
        proxyUsername = Some("pxuser"),
        proxyPassword = Some("wrong")))
      // the JDK client keeps answering the 407 challenge until its attempt
      // limit, then fails the request with an IOException
      val e = intercept[java.io.IOException] {
        client.send(
          HttpRequest.newBuilder(URI.create(origin.url("/data"))).GET().build(),
          HttpResponse.BodyHandlers.ofString())
      }
      e.getMessage should include("authentication")
      all(proxy.requests.map(_.authorized)) shouldBe false
      origin.requestCount shouldBe 0
    } finally { proxy.stop(); origin.stop() }
  }

  test("lookup join traverses the proxy end to end") {
    import spark.implicits._
    val origin = new StubServer().route("/enrich") { req =>
      val k = StubServer.queryMap(req.query).getOrElse("k", "?")
      (200, s"""{"v":"val-$k"}""")
    }.start()
    val proxy = new ProxyServer(requireUser = Some(("u", "p"))).start()
    try {
      val probe = Seq("a", "b", "c").toDF("k")
      val enriched = HttpLookup.join(
        probe,
        keyCols = Seq("k"),
        responseSchema = responseSchema,
        options = Map(
          "url" -> origin.url("/enrich"),
          "lookup-method" -> "GET",
          "http.source.lookup.proxy.host" -> proxy.host,
          "http.source.lookup.proxy.port" -> proxy.port.toString,
          "http.source.lookup.proxy.username" -> "u",
          "http.source.lookup.proxy.password" -> "p"))
      val got = enriched.select(col("k"), col("v")).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      got shouldBe Map("a" -> "val-a", "b" -> "val-b", "c" -> "val-c")
      proxy.requestCount should be >= 3
      origin.requestCount shouldBe 3
    } finally { proxy.stop(); origin.stop() }
  }
}
