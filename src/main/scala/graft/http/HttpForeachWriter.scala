package graft.http

import org.apache.spark.sql.{ForeachWriter, Row}

/** Per-row streaming HTTP sink: `writeStream.foreach(new HttpForeachWriter
  * (options, colIdx))` — the streaming analog of the reference sink's
  * `single` submission mode (reference: `sink/httpclient/PerRequestSubmitter
  * .java`), for pipelines that need one request per record with
  * back-pressure from the stream engine itself.
  *
  * The row is expected to carry the rendered payload string at `payloadIdx`
  * (stage it with `to_json(struct(...))` in the stream's select — same
  * render-in-Catalyst design as the batch sink). One HTTP client per
  * partition-epoch, bounded in-flight via the shared submitter machinery.
  */
final class HttpForeachWriter(
    options: Map[String, String],
    payloadIdx: Int = 0,
    headerPreprocessors: Seq[HeaderPreprocessor] = Nil)
    extends ForeachWriter[Row] {

  @transient private var client: java.net.http.HttpClient = _
  @transient private var url: String = _
  @transient private var method: String = _
  @transient private var timeoutMs: Long = _
  @transient private var classifier: SinkErrorClassifier = _
  @transient private var headers: Seq[(String, String)] = _
  @transient private var contentType: String = _
  @transient private var keying: Option[(String, IdempotencyKeys.Keyer)] = None

  override def open(partitionId: Long, epochId: Long): Boolean = {
    val o = HttpOptions(options)
    keying = o.strOpt(HttpOptions.SinkIdempotencyHeader).map { h =>
      (
        h,
        new IdempotencyKeys.Keyer(
          o.str(HttpOptions.SinkIdempotencyNonce, ""),
          epochId,
          partitionId.toInt))
    }
    url = o.required(HttpOptions.Url)
    method = o.str(HttpOptions.InsertMethod, "POST").toUpperCase
    timeoutMs = o.durationMs(HttpOptions.SinkRequestTimeout, 30000L)
    contentType = PayloadFormats(o.str(HttpOptions.Format, "json")).contentType
    classifier = SinkErrorClassifier(
      o.str(HttpOptions.SinkErrorCodes, SinkErrorClassifier.DefaultErrorExpr),
      o.str(HttpOptions.SinkErrorCodesExclude, ""))
    client = HttpClientFactory.shared(
      HttpClientFactory.ClientConfig.fromOptions(o))
    // same header chain as HttpSink/HttpLookup (HeaderPreprocessors.render):
    // Basic-auth, then caller preprocessors, then OIDC bearer override
    headers = HeaderPreprocessors.render(
      o.withPrefix(HttpOptions.SinkHeaderPrefix).toSeq,
      o.bool(HttpOptions.UseRawAuthHeader, default = false),
      o.strOpt(HttpOptions.OidcTokenRequest).map { tokenReq =>
        val mgr = OidcManagers.shared(
          client,
          tokenReq,
          o.required(HttpOptions.OidcTokenEndpoint),
          o.durationMs(HttpOptions.OidcExpiryReduction, 1000L))
        () => mgr.authenticate()
      },
      headerPreprocessors)
    true
  }

  override def process(row: Row): Unit = {
    val b = java.net.http.HttpRequest
      .newBuilder()
      .uri(java.net.URI.create(url))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .header("Content-Type", contentType)
    headers.foreach { case (k, v) => b.header(k, v) }
    // deterministic replay identity (see IdempotencyKeys): a replayed
    // (epoch, partition) re-carries the identical key SET under any
    // within-partition reorder — occurrence keying, not a sequence number
    keying.foreach { case (h, keyer) =>
      b.setHeader(h, keyer.keyFor(row.getString(payloadIdx)))
    }
    val req = b
      .method(
        method,
        java.net.http.HttpRequest.BodyPublishers.ofString(row.getString(payloadIdx)))
      .build()
    val resp =
      client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    if (classifier.isError(resp.statusCode()))
      throw new HttpStatusCodeValidationFailedException(
        s"HTTP streaming sink got error status ${resp.statusCode()} from $url")
  }

  override def close(errorOrNull: Throwable): Unit = ()
}
