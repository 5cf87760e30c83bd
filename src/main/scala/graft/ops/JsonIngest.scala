package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema-on-read JSONL ingestion with corrupt-line quarantine — the
  * first stage of every web-scale pipeline: crawls arrive as newline-
  * delimited JSON where some fraction of lines is truncated or mangled
  * (mid-write cuts, encoding damage), and a 100 TB ingest must decode the
  * good lines, QUARANTINE the bad ones with their raw payload for
  * inspection, and never abort the job on a malformed record.
  *
  * Spark-first: the decode is `from_json` in PERMISSIVE mode with a
  * `_corrupt_record` column — whole-stage-codegen'd, shuffle-free, no
  * UDF. A malformed line yields nulls for every data field plus the raw
  * line in the corrupt column; a well-formed line decodes its fields and
  * leaves the corrupt column null. That dichotomy IS the quarantine
  * routing predicate.
  *
  * Scale posture (100 TB): pure map-side — the parse stays in the scan
  * projection (zero exchanges; callers partition by whatever downstream
  * needs). Quarantined rows keep the raw payload so a salvage pass
  * (regex repair, re-fetch) can run later without re-reading the crawl.
  */
object JsonIngest {

  /** Decode `jsonCol` against `schema`. Output: the input columns (minus
    * `jsonCol`) + one column per schema field + `is_corrupt` +
    * `raw` (the original line, only for corrupt rows — null otherwise,
    * so the good-path output carries no duplicate payload bytes).
    *
    * A line that is valid JSON but carries none of the schema's fields
    * (e.g. `{}` or unrelated keys) decodes to all-null fields with
    * `is_corrupt` false — schema DRIFT is not corruption; filter on
    * field nullness to detect it.
    */
  def parseJsonl(
      df: DataFrame,
      jsonCol: String,
      schema: StructType): DataFrame = {
    require(
      !schema.fieldNames.contains("_corrupt_record"),
      "schema must not declare _corrupt_record; parseJsonl adds it")
    val withCorrupt = schema.add("_corrupt_record", "string")
    val parsed = from_json(
      col(jsonCol),
      withCorrupt,
      Map(
        "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> "_corrupt_record"))
    val rest = df.columns.filterNot(_ == jsonCol).map(col).toSeq
    // Pin the "malformed ⇒ ALL data fields null" contract in the plan, not
    // the runtime: with spark.sql.json.enablePartialResults=true (the
    // default on newer Sparks) a truncated line can decode its leading
    // fields AND set _corrupt_record, which would silently change the
    // quarantine semantics (and the t_jsonl_ingest oracle) across
    // versions. Masking every field on corrupt rows makes the dichotomy
    // conf- and version-independent, still codegen'd and map-side.
    val corrupt = col("__p._corrupt_record").isNotNull
    df.withColumn("__p", parsed)
      .select(
        rest ++
          schema.fields.toSeq.map(f =>
            when(corrupt, lit(null).cast(f.dataType))
              .otherwise(col(s"__p.${f.name}")).as(f.name)) ++ Seq(
          corrupt.as("is_corrupt"),
          col("__p._corrupt_record").as("raw")): _*)
  }

  /** Split an ingest into (good, quarantine): good rows carry the decoded
    * fields, quarantine rows the raw payload + nothing else decoded.
    */
  def parseAndQuarantine(
      df: DataFrame,
      jsonCol: String,
      schema: StructType): (DataFrame, DataFrame) = {
    val parsed = parseJsonl(df, jsonCol, schema)
    (parsed.filter(!col("is_corrupt")).drop("is_corrupt", "raw"),
      parsed.filter(col("is_corrupt"))
        .select((df.columns.filterNot(_ == jsonCol).map(col) :+
          col("raw")): _*))
  }
}
