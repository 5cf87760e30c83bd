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
    payloadIdx: Int = 0)
    extends ForeachWriter[Row] {

  @transient private var client: java.net.http.HttpClient = _
  @transient private var url: String = _
  @transient private var method: String = _
  @transient private var timeoutMs: Long = _
  @transient private var classifier: SinkErrorClassifier = _
  @transient private var headers: Seq[(String, String)] = _

  override def open(partitionId: Long, epochId: Long): Boolean = {
    val o = HttpOptions(options)
    url = o.required(HttpOptions.Url)
    method = o.str(HttpOptions.InsertMethod, "POST").toUpperCase
    timeoutMs = o.durationMs(HttpOptions.SinkRequestTimeout, 30000L)
    classifier = SinkErrorClassifier(
      o.str(HttpOptions.SinkErrorCodes, SinkErrorClassifier.DefaultErrorExpr),
      o.str(HttpOptions.SinkErrorCodesExclude, ""))
    client = HttpClientFactory.shared(
      HttpClientFactory.ClientConfig.fromOptions(o))
    // same Authorization handling as HttpSink/HttpLookup: Basic-auth value
    // preprocessing, OIDC bearer overriding any configured header
    val basic = BasicAuthHeaderValuePreprocessor(
      o.bool(HttpOptions.UseRawAuthHeader, default = false))
    val base = o.withPrefix(HttpOptions.SinkHeaderPrefix).toSeq.map {
      case (n, v) if n.equalsIgnoreCase("Authorization") =>
        n -> basic.preprocess(v)
      case kv => kv
    }
    headers = o.strOpt(HttpOptions.OidcTokenRequest) match {
      case Some(tokenReq) =>
        val mgr = OidcManagers.shared(
          client,
          tokenReq,
          o.required(HttpOptions.OidcTokenEndpoint),
          o.durationMs(HttpOptions.OidcExpiryReduction, 1000L))
        base.filterNot(_._1.equalsIgnoreCase("Authorization")) :+
          ("Authorization" -> ("Bearer " + mgr.authenticate()))
      case None => base
    }
    true
  }

  override def process(row: Row): Unit = {
    val b = java.net.http.HttpRequest
      .newBuilder()
      .uri(java.net.URI.create(url))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .header("Content-Type", "application/json")
    headers.foreach { case (k, v) => b.header(k, v) }
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
