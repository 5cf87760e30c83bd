package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{AnalyticsQueries, ExtendedQueries, HttpQueries, MoreQueries, PipelineQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the Q5-style multi-join aggregation.
    */
  def entry(spark: SparkSession): DataFrame =
    AnalyticsQueries.queries("q05_local_supplier_volume")(
      spark,
      "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    AnalyticsQueries.queries ++ ExtendedQueries.queries ++ MoreQueries.queries ++
      PipelineQueries.queries ++ HttpQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    AnalyticsQueries.oracles ++ ExtendedQueries.oracles ++ MoreQueries.oracles ++
      PipelineQueries.oracles ++ HttpQueries.oracles
}
