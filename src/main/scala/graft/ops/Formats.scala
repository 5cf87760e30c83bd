package graft.ops

import org.apache.spark.sql.DataFrame

/** Interchange-format round-trips (ORC / CSV / JSON) with pinned options.
  *
  * A 100 TB corpus pipeline rarely lives on one format: upstream crawls
  * arrive as JSONL or CSV, intermediate stages persist columnar (parquet /
  * ORC), and exports leave as JSONL again. The operator contract here is
  * byte-fidelity: `roundTrip(df, f, dir)` must return a frame whose rows
  * are EXACTLY `df`'s for any text content — including embedded quotes,
  * commas, newlines and backslashes in the CSV case — which is what the
  * `t_format_roundtrip` gate hash-verifies against a DuckDB replay of the
  * untouched source.
  *
  * Pinned option choices (the portability contract, kept symmetric between
  * write and read so a fidelity bug on either side breaks the gate):
  *   - CSV: RFC-4180 quoting (`escape = "` → embedded quotes double, not
  *     backslash-escape), no header, `multiLine=true` on read so quoted
  *     embedded newlines survive. Read is schema-explicit — never inferred
  *     (inference is a second scan AND a drift hazard at scale).
  *   - JSON: JSON-Lines, schema-explicit read (same reasons).
  *   - ORC: Spark's native vectorized reader, no knobs needed.
  *
  * Scale posture: writes inherit `df`'s partitioning (one file per task,
  * no shuffle introduced), reads are splittable scans — except CSV
  * `multiLine`, which parses whole files per task; callers round-tripping
  * newline-bearing text through CSV at scale should keep write partitions
  * bounded (they control that upstream) or prefer JSONL/ORC, which both
  * stay splittable.
  *
  * CSV caveat (inherent to the format, not these options): NULL and the
  * empty string are not distinguishable on the wire, so byte-fidelity for
  * string columns holds only for non-null, non-empty values — nullable
  * text belongs in ORC/JSON. The FormatsSpec pins this contract.
  */
object Formats {

  /** The formats [[roundTrip]] accepts. */
  val supported: Seq[String] = Seq("orc", "csv", "json")

  /** Writes `df` to `dir` in `format` and returns a lazy read-back with
    * the same pinned options and `df`'s exact schema. The write happens
    * eagerly (it is the operation under test); the returned frame scans
    * the written files.
    */
  def roundTrip(df: DataFrame, format: String, dir: String): DataFrame = {
    require(
      supported.contains(format),
      s"unsupported round-trip format '$format' (one of: ${supported.mkString(", ")})")
    val spark = df.sparkSession
    format match {
      case "orc" =>
        df.write.mode("overwrite").orc(dir)
        spark.read.schema(df.schema).orc(dir)
      case "csv" =>
        // the writer TRIMS cell whitespace by default (reader does not) —
        // pin both sides false or leading/trailing spaces are lost
        df.write.mode("overwrite")
          .option("header", "false")
          .option("quote", "\"")
          .option("escape", "\"")
          .option("ignoreLeadingWhiteSpace", "false")
          .option("ignoreTrailingWhiteSpace", "false")
          .csv(dir)
        spark.read
          .schema(df.schema)
          .option("header", "false")
          .option("quote", "\"")
          .option("escape", "\"")
          .option("ignoreLeadingWhiteSpace", "false")
          .option("ignoreTrailingWhiteSpace", "false")
          .option("multiLine", "true")
          .csv(dir)
      case "json" =>
        df.write.mode("overwrite").json(dir)
        spark.read.schema(df.schema).json(dir)
    }
  }
}
