package graft.http

import java.util.concurrent.Semaphore

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTTP sink — the Spark-native re-expression of the reference's sink
  * (`sink/HttpSinkInternal.java`, `sink/httpclient/BatchRequestSubmitter.java`,
  * `table/sink/HttpDynamicSink.java`).
  *
  * Rows are serialized to JSON *in Catalyst* (`to_json`, codegen) before the
  * I/O layer ever sees them; each partition then submits payloads to the
  * endpoint either in `batch` mode (JSON-array bodies of
  * `http.sink.request.batch.size` elements, default 500 — reference docs
  * "Batch submission mode") or `single` mode (one request per row), with
  * bounded in-flight concurrency (`sink.requests.max-inflight` /
  * `http.sink.writer.thread-pool.size`).
  *
  * Failure semantics: a response classified as error (default `4XX,5XX`,
  * configurable via `http.sink.error.code` / `.exclude`) or an IOException
  * fails the Spark task — Spark's task retry then re-submits the partition,
  * giving the same at-least-once delivery as the reference's AsyncSink
  * requeue. Batches are independent, so scale-out is linear in partitions.
  *
  * For Structured Streaming use [[HttpSink.foreachBatchWriter]] with
  * `writeStream.foreachBatch` (append mode, at-least-once), mirroring the
  * reference's streaming sink.
  */
object HttpSink {

  final case class SinkReport(requests: Long, records: Long)
      extends Serializable

  /** Write `df` to the configured endpoint. `payload` defaults to the
    * whole-row JSON object (`to_json(struct(*))`), matching the reference's
    * json format element converter (`table/SerializationSchemaElementConverter
    * .java`); pass a custom Column for custom wire formats
    * (the DataStream-API `ElementConverter` analog).
    */
  def write(
      df: DataFrame,
      options: Map[String, String],
      payload: Option[Column] = None,
      headerPreprocessors: Seq[HeaderPreprocessor] = Nil,
      epochId: Long = 0L): Unit = {
    val rt = SinkRuntime(options, headerPreprocessors)
    val payloadCol =
      payload.getOrElse(rt.format.encode(struct(df.columns.map(col): _*)))
    val staged = df.select(payloadCol.cast("string").as("payload"))

    staged.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      val w = rt.newPartitionWriter(
        epochId,
        org.apache.spark.TaskContext.getPartitionId())
      rows.foreach(r => w.add(r.getString(0)))
      w.flush()
    }
  }

  /** `writeStream.foreachBatch(HttpSink.foreachBatchWriter(options))`.
    * The micro-batch id becomes the replay epoch for idempotency keys, so a
    * re-run batch (post-failure recovery) re-sends byte-identical requests
    * under the SAME keys.
    */
  def foreachBatchWriter(
      options: Map[String, String],
      payload: Option[Column] = None,
      headerPreprocessors: Seq[HeaderPreprocessor] = Nil): (DataFrame, Long) => Unit =
    (batchDf, batchId) =>
      write(batchDf, options, payload, headerPreprocessors, epochId = batchId)

  /** Bounded-in-flight async submitter for one partition (reference:
    * `sink/httpclient/BatchRequestSubmitter.java` semantics: async submit,
    * bounded by writer thread-pool / max-inflight; errors surface on flush).
    */
  private[http] final class BatchSubmitter(
      client: java.net.http.HttpClient,
      url: String,
      method: String,
      classifier: SinkErrorClassifier,
      timeoutMs: Long,
      headers: Seq[(String, String)],
      maxInflight: Int,
      callback: RequestCallback = RequestCallback.NoOp,
      contentType: String = "application/json") {
    private val permits = new Semaphore(maxInflight)
    @volatile private var failure: Throwable = _
    private val inflight =
      java.util.concurrent.ConcurrentHashMap.newKeySet[java.util.concurrent.CompletableFuture[_]]()

    def submit(body: String, extraHeaders: Seq[(String, String)] = Nil): Unit = {
      checkFailure()
      permits.acquire()
      val b = java.net.http.HttpRequest
        .newBuilder()
        .uri(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis(timeoutMs))
        .header("Content-Type", contentType)
      headers.foreach { case (k, v) => b.header(k, v) }
      extraHeaders.foreach { case (k, v) => b.header(k, v) }
      val req = b
        .method(
          method,
          java.net.http.HttpRequest.BodyPublishers.ofString(body))
        .build()
      callback.onRequest(method, url, Some(body))
      val fut = client
        .sendAsync(req, java.net.http.HttpResponse.BodyHandlers.ofString())
        .whenComplete { (resp, err) =>
          try {
            if (err != null) {
              callback.onException(method, url, err)
              failure = err
            } else {
              callback.onResponse(method, url, resp.statusCode())
              if (classifier.isError(resp.statusCode()))
                failure = new HttpStatusCodeValidationFailedException(
                  s"HTTP sink got error status ${resp.statusCode()} from $url")
            }
          } finally permits.release()
        }
      inflight.add(fut)
      fut.whenComplete((_, _) => inflight.remove(fut))
    }

    def awaitAll(): Unit = {
      inflight.forEach(f => try f.join() catch { case _: Throwable => () })
      checkFailure()
    }

    private def checkFailure(): Unit = {
      val f = failure
      if (f != null) f match {
        case e: RuntimeException => throw e
        case e => throw new RuntimeException(e)
      }
    }
  }
}

/** Deterministic request identity for replay deduplication.
  *
  * The reference persists un-flushed sink buffers in Flink checkpoint state
  * (`sink/HttpSinkWriterStateSerializer.java:30-41`) so a restored job
  * re-submits exactly the buffered requests. Spark's recovery unit is the
  * partition/micro-batch — a failed task or a recovered stream REPLAYS the
  * whole deterministic partition. The Spark-idiomatic equivalent of the
  * reference's guarantee is therefore deterministic request IDENTITY: every
  * request carries a key derived from (replay epoch, partition, sequence
  * number, body hash), so a replay re-sends byte-identical requests under
  * identical keys and an endpoint that stores seen keys (the standard
  * `Idempotency-Key` contract) deduplicates at-least-once delivery into
  * effectively-once. Enabled by setting `http.sink.idempotency.header` to
  * the header name the endpoint expects; off by default.
  */
private[graft] object IdempotencyKeys {
  /** `<epoch>-<partition>-<seq>-<sha256(body) first 16 hex>` — collision-free
    * within a job run and stable across task retries / micro-batch replays
    * (partition contents and order are deterministic on replay; the body
    * hash additionally ties the key to the exact payload).
    */
  def of(epochId: Long, partitionId: Int, seq: Long, body: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val d = md.digest(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.take(8).map(b => f"$b%02x").mkString
    s"$epochId-$partitionId-$seq-$hex"
  }
}

/** Fully-parsed sink configuration, shared by every sink surface (the Scala
  * `HttpSink.write`, `foreachBatch`, and the DSv2 `graft-http-sink` table):
  * parse once on the driver, ship to executors, build one
  * [[SinkRuntime.newPartitionWriter partition writer]] per task.
  */
private[graft] final case class SinkRuntime(
    url: String,
    format: PayloadFormat,
    method: String,
    mode: String,
    batchSize: Int,
    classifier: SinkErrorClassifier,
    timeoutMs: Long,
    maxInflight: Int,
    headers: Seq[(String, String)],
    useRawAuth: Boolean,
    oidc: Option[(String, String, Long)],
    clientCfg: HttpClientFactory.ClientConfig,
    callbackName: String,
    loggingLevel: String,
    headerPreprocessors: Seq[HeaderPreprocessor],
    idempotencyHeader: Option[String] = None)
    extends Serializable {

  /** Executor-side: a buffering writer over a bounded-in-flight submitter.
    * `add` payload strings; `flush` submits the tail batch and surfaces any
    * async failure (failing the task → Spark retry → at-least-once).
    * `epochId`/`partitionId` seed deterministic [[IdempotencyKeys]] when
    * `http.sink.idempotency.header` is configured.
    */
  def newPartitionWriter(
      epochId: Long = 0L,
      partitionId: Int = 0): SinkRuntime.PartitionWriter = {
    val httpClient = HttpClientFactory.shared(clientCfg)
    val finalHeaders = HeaderPreprocessors.render(
      headers,
      useRawAuth,
      oidc.map { case (tokenReq, endpoint, reductionMs) =>
        val mgr =
          OidcManagers.shared(httpClient, tokenReq, endpoint, reductionMs)
        () => mgr.authenticate()
      },
      headerPreprocessors)
    val submitter = new HttpSink.BatchSubmitter(
      httpClient,
      url,
      method,
      classifier,
      timeoutMs,
      finalHeaders,
      maxInflight,
      RequestCallback.named(
        callbackName,
        RequestCallback.Level.parse(loggingLevel)),
      contentType = format.contentType)
    new SinkRuntime.PartitionWriter(
      submitter, batchSize, mode, format,
      idempotencyHeader, epochId, partitionId)
  }
}

private[graft] object SinkRuntime {

  def apply(
      options: Map[String, String],
      headerPreprocessors: Seq[HeaderPreprocessor]): SinkRuntime = {
    val o = HttpOptions(options)
    val url = o.required(HttpOptions.Url)
    // `format` resolves payload rendering, batch framing and the content
    // type through the PayloadFormats registry (reference:
    // SerializationSchemaElementConverter discovers the table's format)
    val format = PayloadFormats(o.str(HttpOptions.Format, "json"))
    val method = o.str(HttpOptions.InsertMethod, "POST").toUpperCase
    if (method != "POST" && method != "PUT")
      throw new HttpConfigException(
        s"insert-method must be POST or PUT, got '$method'")
    val mode = o.str(HttpOptions.SinkRequestMode, "batch")
    val batchSize = mode match {
      case "batch" => o.int(HttpOptions.SinkBatchSize, 500)
      case "single" => 1
      case other =>
        throw new HttpConfigException(s"Unknown sink request mode '$other'")
    }
    SinkRuntime(
      url = url,
      format = format,
      method = method,
      mode = mode,
      batchSize = batchSize,
      classifier = SinkErrorClassifier(
        o.str(HttpOptions.SinkErrorCodes, SinkErrorClassifier.DefaultErrorExpr),
        o.str(HttpOptions.SinkErrorCodesExclude, "")),
      timeoutMs = o.durationMs(HttpOptions.SinkRequestTimeout, 30000L),
      maxInflight = math.max(
        1,
        math.min(
          o.int(HttpOptions.SinkMaxInflight, 4),
          o.int(HttpOptions.SinkThreadPool, 4))),
      headers = o.withPrefix(HttpOptions.SinkHeaderPrefix).toSeq,
      useRawAuth = o.bool(HttpOptions.UseRawAuthHeader, default = false),
      oidc = o.strOpt(HttpOptions.OidcTokenRequest).map { tr =>
        (
          tr,
          o.required(HttpOptions.OidcTokenEndpoint),
          o.durationMs(HttpOptions.OidcExpiryReduction, 1000L))
      },
      clientCfg = HttpClientFactory.ClientConfig.fromOptions(o),
      callbackName = o.str(HttpOptions.SinkRequestCallback, "slf4j-logger"),
      loggingLevel = o.str("http.logging.level", "MIN"),
      headerPreprocessors = headerPreprocessors,
      idempotencyHeader = o.strOpt(HttpOptions.SinkIdempotencyHeader))
  }

  private[graft] final class PartitionWriter(
      submitter: HttpSink.BatchSubmitter,
      batchSize: Int,
      mode: String,
      format: PayloadFormat,
      idempotencyHeader: Option[String] = None,
      epochId: Long = 0L,
      partitionId: Int = 0) {
    private val batch = new scala.collection.mutable.ArrayBuffer[String](batchSize)
    private var seq = 0L

    private def submit(body: String): Unit = {
      val extra = idempotencyHeader match {
        case Some(h) =>
          Seq(h -> graft.http.IdempotencyKeys.of(epochId, partitionId, seq, body))
        case None => Nil
      }
      seq += 1
      submitter.submit(body, extra)
    }

    def add(payload: String): Unit = {
      batch += payload
      if (batch.size >= batchSize) {
        submit(frame(batch.toSeq))
        batch.clear()
      }
    }

    def flush(): Unit = {
      if (batch.nonEmpty) {
        submit(frame(batch.toSeq))
        batch.clear()
      }
      submitter.awaitAll()
    }

    /** Batch bodies are framed by the format (JSON arrays `[e1,e2,…]` for
      * json, one record per line for csv); single mode sends the payload
      * as-is (reference docs "Request submission").
      */
    private def frame(b: Seq[String]): String =
      if (mode == "single") b.head else format.frameBatch(b)
  }
}
