package graft.http

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Query creators compile lookup configuration into Catalyst [[Column]]
  * expressions that render, per probe row, the request URL and (optionally)
  * the request body. This is the Spark-first re-expression of the reference's
  * `LookupQueryCreator` hierarchy (`table/lookup/querycreators`): where
  * Flink renders requests row-by-row in the TableFunction, we render them in
  * whole-stage-codegen'd expressions, so the narrow I/O op only ever sees
  * finished strings.
  */
final case class CompiledQuery(url: Column, body: Option[Column])

trait QueryCreator extends Serializable {

  /** @param probe the probe-side DataFrame (for column type inspection)
    * @param keyCols the lookup join key columns
    */
  def compile(probe: DataFrame, keyCols: Seq[String]): CompiledQuery
}

object QueryCreator {
  val GenericGet = "http-generic-get-query"
  val GenericJsonUrl = "http-generic-json-url"
  val ElasticLite = "elasticsearch-lite"

  /** Resolve from options (reference: `LookupQueryCreatorFactory` discovery;
    * default creator is `http-generic-json-url` per upstream docs
    * `table/http.md` "Default Query Creator Implementation").
    *
    * `requestFormat` renders generic request bodies (`lookup-request.format`
    * through the [[PayloadFormats]] registry); template-based creators are
    * json-by-construction and ignore it.
    */
  def fromOptions(
      o: HttpOptions,
      requestFormat: PayloadFormat = JsonPayloadFormat): QueryCreator = {
    val url = o.required(HttpOptions.Url)
    val method = o.str(HttpOptions.LookupMethod, "GET").toUpperCase
    val paramFields = o
      .str(HttpOptions.QueryParamFields, "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    // `col:apiName` pairs renaming query-param keys (reference docs
    // `table/http.md` note 13: request column named differently from the
    // API field it maps to)
    val paramFieldsWithKey =
      parseUrlMap(o.str(HttpOptions.QueryParamFieldsWithKey, ""))
    // upstream tightened this: query-param-fields with a body-based method
    // is a config error (reference docs, "Migration from GetInData HTTP
    // connector")
    if ((paramFields.nonEmpty || paramFieldsWithKey.nonEmpty) && method != "GET")
      throw new HttpConfigException(
        s"${HttpOptions.QueryParamFields} cannot be used with $method")
    o.str(HttpOptions.LookupQueryCreator, defaultCreatorName(o)) match {
      case GenericGet =>
        if (method == "GET")
          GenericGetQueryCreator(
            url,
            if (paramFields.isEmpty) None else Some(paramFields),
            paramFieldsWithKey)
        else GenericBodyQueryCreator(url, requestFormat)
      case GenericJsonUrl =>
        GenericJsonUrlQueryCreator(
          url,
          method,
          parseUrlMap(o.str(HttpOptions.UrlMap, "")),
          o.strOpt(HttpOptions.BodyTemplate))
      case ElasticLite => ElasticSearchLiteQueryCreator(url)
      case other =>
        throw new HttpConfigException(s"Unknown lookup-query-creator '$other'")
    }
  }

  private def defaultCreatorName(o: HttpOptions): String =
    if (o.strOpt(HttpOptions.BodyTemplate).isDefined ||
      o.strOpt(HttpOptions.UrlMap).isDefined) GenericJsonUrl
    else GenericGet

  /** `key1:value1,key2:value2` map format (reference docs "Mapping the URL"). */
  def parseUrlMap(s: String): Map[String, String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).map { kv =>
      kv.split(":", 2) match {
        case Array(k, v) => k.trim -> v.trim
        case _ => throw new HttpConfigException(s"Bad url-map entry '$kv'")
      }
    }.toMap

  /** Append rendered query-string to a base url that may already carry one. */
  private[http] def appendQuery(baseUrl: String, qs: Column): Column = {
    val sep = if (baseUrl.contains("?")) "&" else "?"
    concat(lit(baseUrl), when(qs === "", lit("")).otherwise(concat(lit(sep), qs)))
  }

  /** `name=url_encode(value)` pair; null values render as empty string. */
  private[http] def encodedPair(name: String, c: Column): Column =
    concat(lit(name + "="), url_encode(coalesce(c.cast(StringType), lit(""))))

}

/** GET: join keys become query parameters `?k1=v1&k2=v2`, optionally
  * restricted to `http.request.query-param-fields` and/or renamed via
  * `http.request.query-param-fields-with-key` `col:apiName` pairs
  * (reference: `querycreators/GenericGetQueryCreator.java`; migration +
  * note 13 in docs `table/http.md`; url-encoding per
  * `utils/uri/URLEncodedUtils`).
  */
final case class GenericGetQueryCreator(
    baseUrl: String,
    paramFields: Option[Seq[String]] = None,
    paramFieldsWithKey: Map[String, String] = Map.empty)
    extends QueryCreator {
  def compile(probe: DataFrame, keyCols: Seq[String]): CompiledQuery = {
    val params = paramFields match {
      case Some(fields) => keyCols.filter(c => fields.contains(c) || paramFieldsWithKey.contains(c))
      case None => keyCols
    }
    val qs = concat_ws(
      "&",
      params.map(k =>
        QueryCreator.encodedPair(paramFieldsWithKey.getOrElse(k, k), col(k))): _*)
    CompiledQuery(QueryCreator.appendQuery(baseUrl, qs), None)
  }
}

/** POST/PUT: join keys become a flat request body rendered by the
  * configured payload format — a JSON object for the default json format
  * (reference: `querycreators/GenericJsonQueryCreator.java`), a CSV line for
  * `lookup-request.format=csv`, etc.
  */
final case class GenericBodyQueryCreator(
    baseUrl: String,
    format: PayloadFormat = JsonPayloadFormat)
    extends QueryCreator {
  def compile(probe: DataFrame, keyCols: Seq[String]): CompiledQuery =
    CompiledQuery(
      lit(baseUrl),
      Some(format.encode(struct(keyCols.map(col): _*))))
}

/** The `http-generic-json-url` creator (reference:
  * `querycreators/GenericJsonAndUrlQueryCreator.java`; docs
  * "http-generic-json-url Query Creator"): URL `{{placeholder}}` segments
  * resolved through `url-map` (url-encoded unless the placeholder is the
  * complete URL), body from a JSON template with `{{field}}` placeholders.
  */
final case class GenericJsonUrlQueryCreator(
    baseUrl: String,
    method: String,
    urlMap: Map[String, String],
    bodyTemplate: Option[String])
    extends QueryCreator {

  def compile(probe: DataFrame, keyCols: Seq[String]): CompiledQuery = {
    if (method == "GET" && bodyTemplate.isDefined)
      throw new HttpConfigException(
        "http.request.body-template can only be used with POST/PUT")
    val urlCol = compileTemplate(
      probe,
      baseUrl,
      insertName =>
        urlMap.getOrElse(
          insertName,
          throw new HttpConfigException(
            s"url placeholder '$insertName' missing from ${HttpOptions.UrlMap}")),
      encode = !isWholeUrlPlaceholder)
    val bodyCol = bodyTemplate.map { tpl =>
      compileJsonTemplate(probe, tpl)
    }
    CompiledQuery(urlCol, bodyCol)
  }

  private def isWholeUrlPlaceholder: Boolean =
    baseUrl.matches("\\{\\{[^}]+\\}\\}")

  /** Split `text` on `{{name}}` placeholders into a concat of literals and
    * (optionally url-encoded) column refs.
    */
  private def compileTemplate(
      probe: DataFrame,
      text: String,
      resolve: String => String,
      encode: Boolean): Column = {
    val parts = GenericJsonUrlQueryCreator.tokenize(text).map {
      case Left(literal) => lit(literal)
      case Right(name) =>
        val c = col(resolve(name)).cast(StringType)
        if (encode) url_encode(coalesce(c, lit(""))) else coalesce(c, lit(""))
    }
    if (parts.isEmpty) lit("") else concat(parts: _*)
  }

  /** JSON body template: literal JSON text interleaved with JSON-encoded
    * column values.
    */
  private def compileJsonTemplate(probe: DataFrame, tpl: String): Column = {
    val parts = GenericJsonUrlQueryCreator.tokenize(tpl).map {
      case Left(literal) => lit(literal)
      case Right(name) =>
        if (!probe.columns.contains(name))
          throw new HttpConfigException(
            s"body-template placeholder '$name' is not a top-level column")
        GenericJsonUrlQueryCreator.jsonScalar(probe, name)
    }
    if (parts.isEmpty) lit("") else concat(parts: _*)
  }
}

object GenericJsonUrlQueryCreator {
  private val Placeholder = "\\{\\{([^}]+)\\}\\}".r

  /** Tokenize into Left(literal) / Right(placeholderName) runs. */
  def tokenize(text: String): Seq[Either[String, String]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Either[String, String]]
    var last = 0
    for (m <- Placeholder.findAllMatchIn(text)) {
      if (m.start > last) out += Left(text.substring(last, m.start))
      out += Right(m.group(1).trim)
      last = m.end
    }
    if (last < text.length) out += Left(text.substring(last))
    out.toSeq
  }

  /** JSON-encode a scalar column by type: strings (and date/timestamps)
    * quoted with JSON escaping, numerics/booleans raw, null → `null`.
    * Implemented as `to_json(array(c))` minus the array brackets so escaping
    * stays inside codegen.
    */
  def jsonScalar(probe: DataFrame, name: String): Column = {
    import org.apache.spark.sql.functions._
    val c = col(name)
    probe.schema(name).dataType match {
      case dt
          if dt == StringType || dt == DateType || dt == TimestampType ||
            dt == TimestampNTZType || dt.isInstanceOf[VarcharType] ||
            dt.isInstanceOf[CharType] =>
        val wrapped = to_json(array(c)) // ["escaped"]
        when(c.isNull, lit("null"))
          .otherwise(wrapped.substr(lit(2), length(wrapped) - 2))
      case _ => when(c.isNull, lit("null")).otherwise(c.cast(StringType))
    }
  }
}

/** Elasticsearch Query-Lite: GET with `q=key1:"v1" AND key2:"v2"` (reference:
  * `querycreators/ElasticSearchLiteQueryCreator.java`).
  */
final case class ElasticSearchLiteQueryCreator(baseUrl: String)
    extends QueryCreator {
  def compile(probe: DataFrame, keyCols: Seq[String]): CompiledQuery = {
    val lucene = concat_ws(
      " AND ",
      keyCols.map(k =>
        concat(
          lit(k + ":\""),
          coalesce(col(k).cast(StringType), lit("")),
          lit("\""))): _*)
    val qs = concat(lit("q="), url_encode(lucene))
    CompiledQuery(QueryCreator.appendQuery(baseUrl, qs), None)
  }
}
