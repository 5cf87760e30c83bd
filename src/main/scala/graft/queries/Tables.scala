package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared table readers for the driver-gated query suites.
  *
  * ONE owner for the events `ts` normalization: r8 shipped two copies
  * (AnalyticsQueries + ExtendedQueries) and both broke together when the
  * runtime changed how it surfaces the parquet timestamp — seven gates red.
  * The reader now branches on the ACTUAL decoded type instead of assuming a
  * fixed runtime behavior, so a Spark upgrade (or a driver testdata
  * regeneration) degrades to a clear error instead of an analysis failure
  * deep inside each query.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize the events `ts` column to a session-zone TIMESTAMP (the type
    * every downstream window/lag/as-of expression expects), whatever the
    * runtime decoded from the parquet file:
    *
    *   - `TIMESTAMP_NTZ`: parquet TIMESTAMP(isAdjustedToUTC=false) — the
    *     current testdata (micros) and Spark 4.1.2's NTZ inference. The
    *     wall-clock micros ARE the UTC micros (sessions run with
    *     `spark.sql.session.timeZone=UTC`), so the cast is value-preserving
    *     and matches DuckDB, which reads the same column as a naive
    *     timestamp. If the file were nanos, the reader has already truncated
    *     ns → µs exactly like DuckDB does.
    *   - `LONG`: `spark.sql.legacy.parquet.nanosAsLong` runtimes surface
    *     TIMESTAMP(NANOS) as the raw nano count; truncate to micros with
    *     integer `div` (nano epochs exceed 2^53, double division would lose
    *     precision).
    *   - `TIMESTAMP`: already session-zone (isAdjustedToUTC=true files);
    *     pass through.
    */
  def normalizeEventTs(dt: DataType): Column = dt match {
    case TimestampNTZType => col("ts").cast(TimestampType)
    case LongType         => timestamp_micros(expr("ts div 1000"))
    case TimestampType    => col("ts")
    case other =>
      throw new IllegalStateException(
        s"events.ts decoded as unexpected type $other — " +
          "expected TIMESTAMP_NTZ, TIMESTAMP or LONG (nanosAsLong)")
  }

  /** The events table with `ts` normalized per [[normalizeEventTs]]. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    raw.withColumn("ts", normalizeEventTs(raw.schema("ts").dataType))
  }
}
