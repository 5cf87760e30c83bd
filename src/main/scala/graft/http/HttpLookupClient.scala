package graft.http

import java.io.IOException
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import scala.jdk.CollectionConverters._

/** Completion states surfaced through metadata columns (reference:
  * `table/lookup/HttpCompletionState.java` and docs "http-completion-state
  * possible values").
  */
object CompletionState {
  val Success = "SUCCESS"
  val HttpErrorStatus = "HTTP_ERROR_STATUS"
  val Exception = "EXCEPTION"
  val UnableToDeserialize = "UNABLE_TO_DESERIALIZE_RESPONSE"
  val IgnoreStatusCode = "IGNORE_STATUS_CODE"
}

/** Outcome of one lookup HTTP call — the only thing the I/O `mapPartitions`
  * op emits; all parsing happens downstream in Catalyst.
  */
final case class HttpOutcome(
    status: Integer, // null when no response (exception)
    body: String, // null when ignored/failed
    headers: Map[String, Seq[String]],
    state: String,
    error: String)
    extends Serializable

/** Synchronous lookup call executor with the reference's classification +
  * retry semantics (reference: `retry/HttpClientWithRetry.java`,
  * `table/lookup/JavaNetHttpPollingClient.java`):
  *   - success codes → SUCCESS (body kept)
  *   - ignored codes → IGNORE_STATUS_CODE (body dropped)
  *   - retry codes / IOException → retried per [[RetryPolicy]]; exhausted →
  *     HTTP_ERROR_STATUS / EXCEPTION
  *   - other codes → HTTP_ERROR_STATUS (no retry)
  */
final class HttpLookupClient(
    client: HttpClient,
    checker: ResponseChecker,
    ignoredCodes: Set[Int],
    retry: RetryPolicy,
    requestTimeoutMs: Long,
    headers: Seq[(String, String)],
    callback: RequestCallback,
    sleeper: Long => Unit = Thread.sleep) {

  def execute(method: String, url: String, body: Option[String]): HttpOutcome = {
    var attempt = 0
    while (true) {
      val result: Either[Throwable, HttpResponse[String]] =
        try Right(send(method, url, body))
        catch {
          case e: IOException => Left(e)
          case e: InterruptedException => throw e
        }
      result match {
        case Right(resp) =>
          val code = resp.statusCode()
          callback.onResponse(method, url, code)
          if (checker.isSuccessful(code)) {
            return HttpOutcome(
              code,
              resp.body(),
              headersOf(resp),
              CompletionState.Success,
              null)
          } else if (ignoredCodes.contains(code)) {
            return HttpOutcome(
              code,
              null,
              headersOf(resp),
              CompletionState.IgnoreStatusCode,
              null)
          } else if (checker.isRetryable(code) && attempt < retry.maxRetries) {
            attempt += 1
            sleeper(retry.delayMillis(attempt))
          } else {
            return HttpOutcome(
              code,
              null,
              headersOf(resp),
              CompletionState.HttpErrorStatus,
              s"HTTP error status $code for $url")
          }
        case Left(e) =>
          callback.onException(method, url, e)
          if (attempt < retry.maxRetries) {
            attempt += 1
            sleeper(retry.delayMillis(attempt))
          } else {
            return HttpOutcome(
              null,
              null,
              Map.empty,
              CompletionState.Exception,
              s"${e.getClass.getSimpleName}: ${e.getMessage}")
          }
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def send(
      method: String,
      url: String,
      body: Option[String]): HttpResponse[String] = {
    val b = HttpRequest
      .newBuilder()
      .uri(URI.create(url))
      .timeout(Duration.ofMillis(requestTimeoutMs))
    headers.foreach { case (k, v) => b.header(k, v) }
    val req = body match {
      case Some(payload) =>
        b.method(method, HttpRequest.BodyPublishers.ofString(payload)).build()
      case None => b.method(method, HttpRequest.BodyPublishers.noBody()).build()
    }
    callback.onRequest(method, url, body)
    client.send(req, HttpResponse.BodyHandlers.ofString())
  }

  private def headersOf(resp: HttpResponse[String]): Map[String, Seq[String]] =
    resp.headers().map().asScala.map { case (k, v) => k -> v.asScala.toSeq }.toMap
}

/** Request/response observability hook (reference:
  * `HttpPostRequestCallback.java`, `Slf4JHttpLookupPostRequestCallback.java`,
  * `HttpLogger` levels MIN/REQ_RESP/MAX).
  */
trait RequestCallback extends Serializable {
  def onRequest(method: String, url: String, body: Option[String]): Unit
  def onResponse(method: String, url: String, status: Int): Unit
  def onException(method: String, url: String, e: Throwable): Unit
}

object RequestCallback {
  sealed trait Level
  object Level {
    case object Min extends Level // method+uri+status
    case object ReqResp extends Level // + bodies
    case object Max extends Level // + headers
    def parse(s: String): Level = s.toUpperCase match {
      case "MIN" => Min
      case "REQ_RESP" => ReqResp
      case "MAX" => Max
      case other => throw new HttpConfigException(s"Unknown logging level '$other'")
    }
  }

  /** Default slf4j-style logger callback. */
  final case class Slf4jLogger(level: Level = Level.Min) extends RequestCallback {
    @transient private lazy val log =
      org.slf4j.LoggerFactory.getLogger("graft.http.HttpLogger")
    def onRequest(method: String, url: String, body: Option[String]): Unit =
      if (log.isDebugEnabled) level match {
        case Level.Min => log.debug(s"HTTP $method $url")
        case _ => log.debug(s"HTTP $method $url body=${body.getOrElse("")}")
      }
    def onResponse(method: String, url: String, status: Int): Unit =
      if (log.isDebugEnabled) log.debug(s"HTTP $method $url -> $status")
    def onException(method: String, url: String, e: Throwable): Unit =
      if (log.isDebugEnabled) log.debug(s"HTTP $method $url failed: $e")
  }

  val NoOp: RequestCallback = new RequestCallback {
    def onRequest(method: String, url: String, body: Option[String]): Unit = ()
    def onResponse(method: String, url: String, status: Int): Unit = ()
    def onException(method: String, url: String, e: Throwable): Unit = ()
  }

  /** Named callback registry (reference: `HttpPostRequestCallbackFactory`
    * ServiceLoader discovery behind `http.source.lookup.request-callback` /
    * `http.sink.request-callback`; defaults `slf4j-lookup-logger` /
    * `slf4j-logger`). Custom callbacks register by name before building the
    * lookup/sink; factories are (loggingLevel) => callback so the
    * `http.logging.level` option composes.
    */
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Level => RequestCallback]()
  registry.put("slf4j-lookup-logger", lvl => Slf4jLogger(lvl))
  registry.put("slf4j-logger", lvl => Slf4jLogger(lvl))
  registry.put("no-op", _ => NoOp)

  def register(name: String, factory: Level => RequestCallback): Unit =
    registry.put(name, factory)

  def named(name: String, level: Level): RequestCallback =
    Option(registry.get(name)).map(_(level)).getOrElse(
      throw new HttpConfigException(
        s"Unknown request-callback '$name'; registered: " +
          registry.keySet().toArray.mkString(", ")))
}
