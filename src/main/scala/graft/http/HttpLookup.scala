package graft.http

import java.util.concurrent.{Executors, ThreadFactory}
import scala.collection.mutable
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, ExecutionContextExecutorService, Future}

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** HTTP lookup join — the Spark-native re-expression of the reference's HTTP
  * lookup table source (`table/lookup/HttpLookupTableSource.java`,
  * `HttpTableLookupFunction.java`, `AsyncHttpTableLookupFunction.java`).
  *
  * Where Flink's planner inserts a lookup-join operator probing a
  * `LookupTableSource`, we enrich a (batch or streaming) DataFrame directly:
  *
  *   1. the request URL/body are rendered *inside Catalyst* by the configured
  *      [[QueryCreator]] (whole-stage codegen; no per-row interpretation),
  *   2. a narrow `mapPartitions` performs the HTTP I/O (per-executor client +
  *      cache, bounded in-flight concurrency, retries, classification) — it
  *      maps `String → String + metadata` and shuffles nothing,
  *   3. the JSON response is decoded by `from_json` (+ `explode_outer` for
  *      `result-type=array`) back in Catalyst.
  *
  * At 1000-executor scale this keeps pressure on the REST endpoint bounded by
  * `executors × thread-pool size`, de-duplicates calls through the
  * per-executor cache, and leaves the plan fully pipelined (no shuffle, no
  * driver round-trips).
  *
  * Output columns = probe columns ++ response-schema columns (response fields
  * whose names collide with probe columns are dropped — by construction these
  * are the join keys echoed back) ++ optional metadata columns
  * `http_status_code`, `error_string`, `http_headers_map`,
  * `http_completion_state` (reference: "Available Metadata" docs table).
  */
object HttpLookup {

  private val ReqUrl = "__graft_req_url"
  private val ReqBody = "__graft_req_body"
  private val RespStatus = "__graft_resp_status"
  private val RespBody = "__graft_resp_body"
  private val RespHeaders = "__graft_resp_headers"
  private val RespState = "__graft_resp_state"
  private val RespError = "__graft_resp_error"
  private val RespParsed = "__graft_resp_parsed"

  val MetaStatusCode = "http_status_code"
  val MetaErrorString = "error_string"
  val MetaHeadersMap = "http_headers_map"
  val MetaCompletionState = "http_completion_state"

  /** Emitted only under [[HttpOptions.EmitMatchColumn]] (internal). */
  val MatchedColumn = "__graft_matched"

  /** Serializable per-task I/O config. */
  private final case class IoConfig(
      method: String,
      successExpr: String,
      retryExpr: String,
      ignoredExpr: String,
      retryPolicy: RetryPolicy,
      requestTimeoutMs: Long,
      headers: Seq[(String, String)],
      clientCfg: HttpClientFactory.ClientConfig,
      concurrency: Int,
      continueOnError: Boolean,
      cacheId: String,
      cacheOptions: Map[String, String],
      cacheMissingKey: Boolean,
      oidc: Option[(String, String, Long)], // tokenRequest, endpoint, expiryReductionMs
      useRawAuthHeader: Boolean,
      loggingLevel: String,
      callbackName: String,
      preprocessors: Seq[HeaderPreprocessor])

  private def makeIoConfig(
      o: HttpOptions,
      options: Map[String, String],
      requestFormat: PayloadFormat,
      headerPreprocessors: Seq[HeaderPreprocessor]): IoConfig =
    IoConfig(
      method = o.str(HttpOptions.LookupMethod, "GET").toUpperCase,
      successExpr = o.str(HttpOptions.SuccessCodes, "2XX"),
      retryExpr = o.str(HttpOptions.RetryCodes, "500,503,504"),
      ignoredExpr = o.str(HttpOptions.IgnoredCodes, ""),
      retryPolicy = RetryPolicy.fromOptions(o),
      requestTimeoutMs = o.durationMs(HttpOptions.RequestTimeout, 30000L),
      headers = {
        val hs = o.withPrefix(HttpOptions.SourceHeaderPrefix).toSeq
        val method = o.str(HttpOptions.LookupMethod, "GET").toUpperCase
        // body-based lookups default to the request format's content type
        // (reference: BodyBasedRequestFactory sets application/json for the
        // bundled json format)
        if (method != "GET" && !hs.exists(_._1.equalsIgnoreCase("Content-Type")))
          hs :+ ("Content-Type" -> requestFormat.contentType)
        else hs
      },
      clientCfg = HttpClientFactory.ClientConfig.fromOptions(o),
      concurrency =
        if (o.bool(HttpOptions.AsyncPolling, default = false)) {
          // no separate response stage in the pipelined iterator: honor
          // both reference pool knobs as one in-flight bound (see
          // HttpOptions.ResponseThreadPool)
          val req = o.int(HttpOptions.RequestThreadPool, 8)
          math.max(req, o.int(HttpOptions.ResponseThreadPool, req))
        } else 1,
      continueOnError = o.bool(HttpOptions.ContinueOnError, default = false),
      cacheId = options.toSeq.sorted.mkString("|"),
      cacheOptions = options,
      cacheMissingKey = o.bool(HttpOptions.CacheMissingKey, default = true),
      oidc = o.strOpt(HttpOptions.OidcTokenRequest).map { tr =>
        (
          tr,
          o.required(HttpOptions.OidcTokenEndpoint),
          o.durationMs(HttpOptions.OidcExpiryReduction, 1000L))
      },
      useRawAuthHeader = o.bool(HttpOptions.UseRawAuthHeader, default = false),
      loggingLevel = o.str(HttpOptions.LoggingLevel, "MIN"),
      callbackName =
        o.str(HttpOptions.SourceRequestCallback, "slf4j-lookup-logger"),
      preprocessors = headerPreprocessors)

  def join(
      probe: DataFrame,
      keyCols: Seq[String],
      responseSchema: StructType,
      options: Map[String, String],
      includeMetadata: Boolean = false,
      headerPreprocessors: Seq[HeaderPreprocessor] = Nil): DataFrame = {
    val o = HttpOptions(options)
    // reference `lookup-request.format` / `format` (both default json):
    // request serialization and response deserialization resolve through the
    // PayloadFormats registry (the SPI-discovery analog) — a CSV endpoint is
    // 'format'='csv', a custom wire format is PayloadFormats.register(...)
    val requestFormat =
      PayloadFormats(o.str(HttpOptions.LookupRequestFormat, "json"))
    val responseFormat = PayloadFormats(o.str(HttpOptions.Format, "json"))
    val creator = QueryCreator.fromOptions(o, requestFormat)
    val compiled = creator.compile(probe, keyCols)

    val io = makeIoConfig(o, options, requestFormat, headerPreprocessors)

    // fail fast on the driver like the reference's factory discovery does
    RequestCallback.named(
      io.callbackName,
      RequestCallback.Level.parse(io.loggingLevel))

    val staged = probe
      .withColumn(ReqUrl, compiled.url)
      .withColumn(
        ReqBody,
        compiled.body.getOrElse(lit(null).cast(StringType)))

    // dedup-keys: when probe keys repeat heavily (classic enrichment), call
    // the service once per DISTINCT rendered request and join the responses
    // back — request volume drops from |rows| to |unique keys| and AQE
    // broadcasts the (small) response relation, so the probe itself never
    // shuffles. Batch-only (distinct isn't available on streams); the
    // per-executor cache covers the streaming case instead.
    val dedupKeys =
      o.bool(HttpOptions.DedupKeys, default = false) && !probe.isStreaming

    // AQE coalesces the (byte-tiny) distinct-keys shuffle down to one
    // partition, which would serialize all the I/O onto a single task —
    // spread the requests explicitly: latency-bound work wants parallelism
    // by request count, not by data size.
    val ioPartitions = o.int(
      HttpOptions.LookupPartitions,
      probe.sparkSession.sparkContext.defaultParallelism)
    val ioInput =
      if (dedupKeys)
        staged.select(col(ReqUrl), col(ReqBody)).distinct()
          .repartition(ioPartitions)
      else staged

    val outSchema = StructType(
      ioInput.schema.fields ++ Array(
        StructField(RespStatus, IntegerType),
        StructField(RespBody, StringType),
        StructField(
          RespHeaders,
          MapType(StringType, ArrayType(StringType))),
        StructField(RespState, StringType),
        StructField(RespError, StringType)))

    val urlIdx = ioInput.schema.fieldIndex(ReqUrl)
    val bodyIdx = ioInput.schema.fieldIndex(ReqBody)

    val ioResults = ioInput.mapPartitions { iter =>
      executePartition(iter, io, urlIdx, bodyIdx)
    }(Encoders.row(outSchema))

    val ioDf =
      if (dedupKeys) {
        // null-safe equality: ReqBody is null for GET lookups
        val r = ioResults
          .withColumnRenamed(ReqUrl, ReqUrl + "_r")
          .withColumnRenamed(ReqBody, ReqBody + "_r")
        staged
          .join(
            r,
            col(ReqUrl) === col(ReqUrl + "_r") &&
              col(ReqBody) <=> col(ReqBody + "_r"))
          .drop(ReqUrl + "_r", ReqBody + "_r")
      } else ioResults

    decodeProject(ioDf, probe.columns.toSeq, responseSchema, responseFormat, o, includeMetadata)
  }

  /** Serializable state-store record for [[joinStateCached]]. */
  private[http] final case class CachedLookup(
      status: Option[Int],
      body: String,
      headers: Map[String, Seq[String]],
      state: String,
      error: String,
      fetchedAtMs: Long)

  /** Streaming lookup join whose cache lives in the STREAMING STATE STORE —
    * the Spark-native re-expression of Flink's cache-in-operator-state
    * restart semantics (the reference's lookup runs inside a Flink job whose
    * state survives restarts; the per-executor LRU of [[join]] dies with the
    * executor). Each micro-batch groups probe rows by rendered request; one
    * state entry per distinct request holds the classified response with its
    * fetch timestamp. A checkpointed restart RESTORES the cache — cached
    * keys are served with zero re-fetches by the new run. Entries expire
    * `lookup.partial-cache.expire-after-write` (default 10 min) after their
    * fetch and are evicted via processing-time timeouts, so state size is
    * bounded by the distinct-request working set, not stream length.
    *
    * Costs one shuffle per micro-batch (the groupByKey on the rendered
    * request) — the same keyed exchange Flink's lookup operator implies.
    * Requests also de-duplicate within the batch for free (one group = one
    * call). Use [[join]] when restart-transparent caching is not needed and
    * the narrow shuffle-free plan matters more.
    *
    * Because eviction uses processing-time timers, the engine re-triggers
    * batches even without data to evaluate them — run the query with a
    * `Trigger.ProcessingTime(...)` interval so an idle stream doesn't
    * busy-loop empty batches.
    */
  def joinStateCached(
      probe: DataFrame,
      keyCols: Seq[String],
      responseSchema: StructType,
      options: Map[String, String],
      includeMetadata: Boolean = false,
      headerPreprocessors: Seq[HeaderPreprocessor] = Nil): DataFrame = {
    require(
      probe.isStreaming,
      "joinStateCached needs a streaming probe; use join for batch inputs")
    val o = HttpOptions(options)
    val requestFormat =
      PayloadFormats(o.str(HttpOptions.LookupRequestFormat, "json"))
    val responseFormat = PayloadFormats(o.str(HttpOptions.Format, "json"))
    val creator = QueryCreator.fromOptions(o, requestFormat)
    val compiled = creator.compile(probe, keyCols)
    val io = makeIoConfig(o, options, requestFormat, headerPreprocessors)
    RequestCallback.named(
      io.callbackName,
      RequestCallback.Level.parse(io.loggingLevel))
    val ttlMs = o.durationMs(HttpOptions.CacheExpireAfterWrite, 600000L)

    val staged = probe
      .withColumn(ReqUrl, compiled.url)
      .withColumn(
        ReqBody,
        compiled.body.getOrElse(lit(null).cast(StringType)))
    val stagedSchema = staged.schema
    val urlIdx = stagedSchema.fieldIndex(ReqUrl)
    val bodyIdx = stagedSchema.fieldIndex(ReqBody)
    val outSchema = StructType(
      stagedSchema.fields ++ Array(
        StructField(RespStatus, IntegerType),
        StructField(RespBody, StringType),
        StructField(
          RespHeaders,
          MapType(StringType, ArrayType(StringType))),
        StructField(RespState, StringType),
        StructField(RespError, StringType)))

    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val keyEnc = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    val stateEnc = Encoders.product[CachedLookup]
    val outEnc = Encoders.row(outSchema)

    val grouped = staged.groupByKey { row =>
      (row.getString(urlIdx), Option(rowBody(row, bodyIdx)).getOrElse(""))
    }(keyEnc)

    val ioDf = grouped.flatMapGroupsWithState[CachedLookup, Row](
      OutputMode.Append,
      GroupStateTimeout.ProcessingTimeTimeout) {
      (key: (String, String), rows: Iterator[Row], state: GroupState[CachedLookup]) =>
        if (state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
          val buffered = rows.toSeq // bounded: rows for ONE key in ONE batch
          val now = System.currentTimeMillis()
          val cached = state.getOption
          val oc = cached
            .filter(c => now - c.fetchedAtMs < ttlMs)
            .map(c => HttpOutcome(
              c.status.map(Integer.valueOf).orNull,
              c.body, c.headers, c.state, c.error))
            .getOrElse {
              val body = buffered.headOption
                .map(r => rowBody(r, bodyIdx)).orNull
              val outcome = lookupClientFor(io)
                .execute(io.method, key._1, Option(body))
              val cacheable = outcome.state == CompletionState.Success ||
                (io.cacheMissingKey &&
                  outcome.state == CompletionState.IgnoreStatusCode)
              if (cacheable) {
                state.update(CachedLookup(
                  Option(outcome.status).map(_.intValue),
                  outcome.body, outcome.headers, outcome.state,
                  outcome.error, now))
              } else if (cached.isDefined) {
                // Validity is write-based but eviction is access-based:
                // without this, a stale entry for a persistently failing key
                // would have its timer re-armed on every access and never
                // leave the store.
                state.remove()
              }
              outcome
            }
          // keep the eviction clock armed whenever state exists
          if (state.exists) state.setTimeoutDuration(ttlMs)
          val tail = Seq(oc.status, oc.body, oc.headers, oc.state, oc.error)
          buffered.iterator.map { row =>
            if (!io.continueOnError &&
              (oc.state == CompletionState.HttpErrorStatus ||
                oc.state == CompletionState.Exception))
              throw new HttpStatusCodeValidationFailedException(
                s"HTTP lookup failed (${oc.error}); set " +
                  s"'${HttpOptions.ContinueOnError}'='true' to continue " +
                  "with null enrichment columns")
            Row.fromSeq(row.toSeq ++ tail)
          }
        }
    }(stateEnc, outEnc)

    decodeProject(
      ioDf.toDF(),
      probe.columns.toSeq,
      responseSchema,
      responseFormat,
      o,
      includeMetadata)
  }

  /** Back in Catalyst after the I/O op: decode + classify + project.
    *
    * A corrupt-record field detects undecodable bodies (PERMISSIVE decode
    * yields an all-null struct, not a null struct, on garbage — the corrupt
    * column is the reliable signal). Decoding goes through the resolved
    * PayloadFormat, so a csv (or registered custom) endpoint plugs in here.
    */
  private def decodeProject(
      ioDf: DataFrame,
      probeColumns: Seq[String],
      responseSchema: StructType,
      responseFormat: PayloadFormat,
      o: HttpOptions,
      includeMetadata: Boolean): DataFrame = {
    val Corrupt = "__graft_corrupt"
    val schemaWithCorrupt =
      StructType(responseSchema.fields :+ StructField(Corrupt, StringType))
    val resultType = o.str(HttpOptions.ResultType, "single-value")
    val isArray = resultType match {
      case "array" => true
      case "single-value" => false
      case other =>
        throw new HttpConfigException(s"Unknown result-type '$other'")
    }
    // Array mode keeps the PRE-explode parse around: "parse failed" must be
    // judged on the whole body, not per exploded element — a valid empty
    // array `[]` explodes (outer) to one null element, which is "parsed
    // empty", not "undecodable".
    val ArrParsed = "__graft_resp_arr"
    var out =
      if (isArray) {
        val arr = responseFormat
          .decodeArray(col(RespBody), responseSchema, Corrupt)
          .getOrElse(throw new HttpConfigException(
            s"result-type=array is not supported by format " +
              s"'${responseFormat.name}'"))
        ioDf
          .withColumn(ArrParsed, arr)
          .withColumn(RespParsed, explode_outer(col(ArrParsed)))
      } else
        ioDf.withColumn(
          RespParsed,
          responseFormat.decode(col(RespBody), responseSchema, Corrupt))

    // SUCCESS but undecodable body → UNABLE_TO_DESERIALIZE_RESPONSE with the
    // raw body as error-string (reference: "Available Metadata" doc rules).
    // Materialize the predicate BEFORE rewriting any column it references —
    // chained withColumn re-resolves by name, so updating RespState first
    // would silently change the predicate for the later updates.
    val Undec = "__graft_undec"
    val parseFailed =
      if (isArray)
        col(ArrParsed).isNull ||
          col(RespParsed).getField(Corrupt).isNotNull
      else
        col(RespParsed).isNull ||
          col(RespParsed).getField(Corrupt).isNotNull
    out = out.withColumn(
      Undec,
      col(RespState) === CompletionState.Success &&
        col(RespBody).isNotNull && parseFailed)
    out = out
      .withColumn(
        RespError,
        when(col(Undec), col(RespBody)).otherwise(col(RespError)))
      .withColumn(
        RespState,
        when(col(Undec), lit(CompletionState.UnableToDeserialize))
          .otherwise(col(RespState)))
      // null the parsed struct so enrichment columns come out null rather
      // than partially parsed
      .withColumn(
        RespParsed,
        when(col(Undec), lit(null).cast(schemaWithCorrupt))
          .otherwise(col(RespParsed)))

    // strict decode (`json.fail-on-missing-field`): a SUCCESS response
    // that PARSED but lacks a declared top-level field fails the job at
    // evaluation time (raise_error stays inside codegen). Undecodable
    // bodies keep their UNABLE_TO_DESERIALIZE classification — strict
    // mode tightens field presence, not body validity.
    val strict =
      o.bool(HttpOptions.JsonFailOnMissingField, default = false) ||
        o.bool(
          HttpOptions.LookupRequestJsonFailOnMissingField,
          default = false)
    if (strict) {
      val keys =
        (if (isArray) responseFormat.recordKeysArray(col(RespBody))
         else responseFormat.recordKeys(col(RespBody)))
          .getOrElse(throw new HttpConfigException(
            s"${HttpOptions.JsonFailOnMissingField} is not supported by " +
              s"format '${responseFormat.name}' (cannot enumerate record keys)"))
      val declared = array(responseSchema.fieldNames.toSeq.map(lit): _*)
      val missingOf: Column => Column =
        ks => filter(declared, n => !array_contains(ks, n))
      // array edge: an element that is not a JSON object parses to a null
      // key map, flatten then yields null and the violation stays false —
      // strict mode polices FIELD PRESENCE on object records; non-object
      // elements are the schema parse's (corrupt-record) concern
      val missing =
        if (isArray) array_distinct(flatten(transform(keys, missingOf)))
        else missingOf(keys)
      val violation = col(RespState) === CompletionState.Success &&
        !col(Undec) && keys.isNotNull && size(missing) > 0
      out = out.withColumn(
        RespParsed,
        when(
          violation,
          raise_error(concat(
            lit(s"${HttpOptions.JsonFailOnMissingField}: response body " +
              "is missing declared field(s) ["),
            array_join(missing, ", "),
            lit("] in body: "),
            col(RespBody))))
          .otherwise(col(RespParsed)))
    }

    val leftOuter = o.str(HttpOptions.LookupJoinType, "inner")
      .toLowerCase match {
      case "inner" => false
      case "left" | "left_outer" | "leftouter" => true
      case other => throw new HttpConfigException(
        s"Unknown ${HttpOptions.LookupJoinType} '$other' (inner|left)")
    }

    if (isArray && !leftOuter) {
      // A valid empty-array response means "no result": the reference's
      // lookup function returns zero rows and the (inner) lookup join emits
      // nothing — drop the explode_outer placeholder row rather than
      // misreporting it. (LEFT keeps it: probe row with null enrichment.)
      out = out.filter(
        !(col(RespState) === CompletionState.Success &&
          col(ArrParsed).isNotNull && size(col(ArrParsed)) === 0))
    }

    if (leftOuter) {
      // LEFT-join semantics: a no-match (ignored status, e.g. 404) keeps
      // the probe row; its enrichment struct is nulled so the response
      // columns come out null rather than parsed from the error body.
      out = out.withColumn(
        RespParsed,
        when(col(RespState) === CompletionState.Success, col(RespParsed))
          .otherwise(lit(null).cast(schemaWithCorrupt)))
    } else if (!includeMetadata) {
      // Inner-join semantics: ignored responses emit no row when no metadata
      // columns are declared (docs: "Available Metadata").
      out = out.filter(col(RespState) =!= CompletionState.IgnoreStatusCode)
    }

    val probeCols = probeColumns.map(col)
    val respCols = responseSchema.fields.toSeq
      .filterNot(f => probeColumns.contains(f.name))
      .map(f => col(RespParsed).getField(f.name).as(f.name))
    val metaCols =
      if (includeMetadata)
        Seq(
          col(RespStatus).as(MetaStatusCode),
          col(RespError).as(MetaErrorString),
          col(RespHeaders).as(MetaHeadersMap),
          col(RespState).as(MetaCompletionState))
      else Seq.empty[Column]
    // internal marker for SQL LEFT-join rewrites: did the lookup produce an
    // actual enrichment struct (vs a kept-but-unmatched probe row)?
    val matchCols =
      if (o.bool(HttpOptions.EmitMatchColumn, default = false))
        Seq((col(RespState) === CompletionState.Success &&
          col(RespParsed).isNotNull).as(MatchedColumn))
      else Seq.empty[Column]

    out.select(probeCols ++ respCols ++ metaCols ++ matchCols: _*)
  }

  // ---------------------------------------------------------------------
  // Per-partition I/O
  // ---------------------------------------------------------------------

  /** Shared daemon pool for async lookup; concurrency is bounded per task by
    * the pending-queue size, so a cached pool cannot run away.
    */
  private lazy val sharedPool: ExecutionContextExecutorService =
    ExecutionContext.fromExecutorService(
      Executors.newCachedThreadPool(new ThreadFactory {
        private val n = new java.util.concurrent.atomic.AtomicInteger()
        def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"graft-http-lookup-${n.incrementAndGet()}")
          t.setDaemon(true)
          t
        }
      }))

  /** Build the per-task lookup client (per-executor shared JDK client +
    * rendered headers + classification/retry) — used by the mapPartitions
    * I/O op and the state-store-cached streaming variant.
    */
  private def lookupClientFor(io: IoConfig): HttpLookupClient = {
    val shard = Option(org.apache.spark.TaskContext.get())
      .map(_.partitionId()).getOrElse(0)
    val httpClient = HttpClientFactory.shared(io.clientCfg, shard)
    new HttpLookupClient(
      httpClient,
      ResponseChecker(io.successExpr, io.retryExpr),
      if (io.ignoredExpr.trim.isEmpty) Set.empty
      else HttpCodes.parse(io.ignoredExpr),
      io.retryPolicy,
      io.requestTimeoutMs,
      renderHeaders(io, httpClient),
      RequestCallback.named(
        io.callbackName,
        RequestCallback.Level.parse(io.loggingLevel)))
  }

  private def executePartition(
      iter: Iterator[Row],
      io: IoConfig,
      urlIdx: Int,
      bodyIdx: Int): Iterator[Row] = {
    val client = lookupClientFor(io)
    val cache = LookupCache.shared(io.cacheId, HttpOptions(io.cacheOptions))

    def call(url: String, body: String): HttpOutcome = {
      val key = url + "\u0000" + (if (body == null) "" else body)
      cache.flatMap(_.get(key)) match {
        case Some(hit) => hit
        case None =>
          val outcome = client.execute(io.method, url, Option(body))
          val cacheable = outcome.state == CompletionState.Success ||
            (io.cacheMissingKey && outcome.state == CompletionState.IgnoreStatusCode)
          if (cacheable) cache.foreach(_.put(key, outcome))
          outcome
      }
    }

    def emit(row: Row, oc: HttpOutcome): Row = {
      if (!io.continueOnError &&
        (oc.state == CompletionState.HttpErrorStatus ||
          oc.state == CompletionState.Exception))
        throw new HttpStatusCodeValidationFailedException(
          s"HTTP lookup failed (${oc.error}); set " +
            s"'${HttpOptions.ContinueOnError}'='true' to continue with null " +
            "enrichment columns")
      Row.fromSeq(
        row.toSeq ++ Seq(oc.status, oc.body, oc.headers, oc.state, oc.error))
    }

    if (io.concurrency <= 1) {
      iter.map { row =>
        emit(row, call(row.getString(urlIdx), rowBody(row, bodyIdx)))
      }
    } else {
      // Bounded-concurrency pipelined iterator: submit up to `concurrency`
      // requests ahead, emit strictly in input order (the async analog of the
      // reference's AsyncHttpTableLookupFunction with ordered wait).
      implicit val ec: ExecutionContext = sharedPool
      new Iterator[Row] {
        private val pending = mutable.Queue.empty[(Row, Future[HttpOutcome])]
        private def fill(): Unit =
          while (pending.size < io.concurrency && iter.hasNext) {
            val row = iter.next()
            val url = row.getString(urlIdx)
            val body = rowBody(row, bodyIdx)
            pending.enqueue(row -> Future(call(url, body)))
          }
        def hasNext: Boolean = { fill(); pending.nonEmpty }
        def next(): Row = {
          fill()
          val (row, fut) = pending.dequeue()
          emit(row, Await.result(fut, Duration.Inf))
        }
      }
    }
  }

  private def rowBody(row: Row, bodyIdx: Int): String =
    if (row.isNullAt(bodyIdx)) null else row.getString(bodyIdx)

  /** Resolve static headers once per task through the shared composable
    * chain ([[HeaderPreprocessors.render]]): Basic-auth transformation, then
    * caller preprocessors, then the OIDC bearer override (token refreshed
    * lazily via the per-executor manager).
    */
  private def renderHeaders(
      io: IoConfig,
      httpClient: java.net.http.HttpClient): Seq[(String, String)] =
    HeaderPreprocessors.render(
      io.headers,
      io.useRawAuthHeader,
      io.oidc.map { case (tokenReq, endpoint, reductionMs) =>
        val mgr = OidcManagers.shared(httpClient, tokenReq, endpoint, reductionMs)
        () => mgr.authenticate()
      },
      io.preprocessors)
}

/** Per-executor OIDC token manager registry (one manager per endpoint+request
  * so the cached token is shared by all tasks on the executor).
  */
object OidcManagers {
  private val instances =
    new java.util.concurrent.ConcurrentHashMap[String, OidcTokenManager]()
  def shared(
      client: java.net.http.HttpClient,
      tokenRequest: String,
      endpoint: String,
      expiryReductionMs: Long): OidcTokenManager =
    instances.computeIfAbsent(
      endpoint + "\u0000" + tokenRequest,
      _ =>
        new OidcTokenManager(
          client,
          tokenRequest,
          endpoint,
          java.time.Duration.ofMillis(expiryReductionMs)))
}

/** Reference: `HttpStatusCodeValidationFailedException.java`. */
class HttpStatusCodeValidationFailedException(msg: String)
    extends RuntimeException(msg)
