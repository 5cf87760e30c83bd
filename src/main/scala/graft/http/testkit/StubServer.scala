package graft.http.testkit

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger
import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Local HTTP stub server (JDK `com.sun.net.httpserver`) — the zero-egress
  * analog of the WireMock fixtures the reference uses in its integration
  * tests (e.g. `JavaNetHttpPollingClientWithWireTest.java`,
  * `HttpLookupTableSourceITCaseTest.java`). Serves deterministic responses,
  * records every request, and supports fault injection (fail N times then
  * succeed, fixed status, delays) for retry/classification specs.
  */
final class StubServer(recording: Boolean = true) {
  final case class Recorded(
      method: String,
      path: String,
      query: String,
      body: String,
      headers: Map[String, List[String]])

  // large accept backlog: hundreds of concurrent lookup connections would
  // otherwise overflow the default queue and pay 1s+ SYN retransmits
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 4096)
  server.setExecutor(
    java.util.concurrent.Executors.newFixedThreadPool(
      64,
      (r: Runnable) => {
        val t = new Thread(r, "graft-stub-server")
        t.setDaemon(true) // never block JVM exit (Verify/Bench mains)
        t
      }))
  private val recorded = new ConcurrentLinkedQueue[Recorded]()

  def port: Int = server.getAddress.getPort
  def url(path: String): String = s"http://127.0.0.1:$port$path"

  def requests: List[Recorded] = recorded.asScala.toList
  def requestCount: Int = recorded.size()
  def clear(): Unit = recorded.clear()

  /** Route: handler maps a recorded request to (status, body). */
  def route(path: String)(handler: Recorded => (Int, String)): this.type = {
    server.createContext(
      path,
      (exchange: HttpExchange) => {
        val req = record(exchange)
        val (status, body) =
          try handler(req)
          catch { case e: Throwable => (500, s"stub handler error: $e") }
        respond(exchange, status, body)
      })
    this
  }

  /** Route that fails with `failStatus` for the first `failures` calls (per
    * route), then delegates — for retry specs.
    */
  def flakyRoute(path: String, failures: Int, failStatus: Int = 503)(
      handler: Recorded => (Int, String)): this.type = {
    val remaining = new AtomicInteger(failures)
    route(path) { req =>
      if (remaining.getAndDecrement() > 0) (failStatus, "transient failure")
      else handler(req)
    }
  }

  private def record(exchange: HttpExchange): Recorded = {
    val body =
      new String(exchange.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val req = Recorded(
      exchange.getRequestMethod,
      exchange.getRequestURI.getPath,
      Option(exchange.getRequestURI.getRawQuery).getOrElse(""),
      body,
      exchange.getRequestHeaders.asScala.map { case (k, v) =>
        k -> v.asScala.toList
      }.toMap)
    if (recording) recorded.add(req)
    req
  }

  private def respond(exchange: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    exchange.getResponseHeaders.add("Content-Type", "application/json")
    exchange.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) exchange.getResponseBody.write(bytes)
    exchange.close()
  }

  def start(): this.type = { server.start(); this }
  def stop(): Unit = server.stop(0)
}

object StubServer {
  def apply(): StubServer = new StubServer(recording = true)

  /** Serving-only stub (skips request capture — for load-bearing fixtures
    * like the bench lookup service).
    */
  def serveOnly(): StubServer = new StubServer(recording = false)

  /** Parse a query string into a name→value map (first value wins). */
  def queryMap(q: String): Map[String, String] =
    q.split("&").filter(_.nonEmpty).map { kv =>
      kv.split("=", 2) match {
        case Array(k, v) =>
          java.net.URLDecoder.decode(k, "UTF-8") ->
            java.net.URLDecoder.decode(v, "UTF-8")
        case Array(k) => java.net.URLDecoder.decode(k, "UTF-8") -> ""
      }
    }.toMap
}
