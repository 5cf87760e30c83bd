package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** One-pass corpus composition report (the "corpus card" / datasheet
  * numbers every curation run ends with: how many documents and tokens per
  * language × source, how long they run, how duplicated they are) — the
  * summary that feeds mixture design ([[Sampling.weightedMix]] /
  * [[Sampling.temperatureMix]] want these counts as input) and the
  * documentation a released dataset ships with.
  *
  * Every statistic except the final mean is an EXACT INTEGER aggregate
  * (counts, sums, max, and an exact distinct-content count over the
  * portable [[TextFunctions.hash61]]), so the report is deterministic
  * under any partitioning and hash-gateable; `mean_tokens` is one double
  * division of two exact longs per group.
  *
  * Scale posture (100 TB): ONE partial-agg'd shuffle keyed by the group
  * columns — per-doc token/char counts fold map-side, and the distinct
  * content count partial-aggregates on (group, hash) before the group
  * regroup (Spark's two-phase distinct agg), so the shuffle carries one
  * row per distinct (group, content) — bounded by the deduplicated
  * corpus, never the raw one. Output group count = |langs| × |sources|:
  * driver-safe by construction.
  */
object CorpusStats {

  /** Per-group report over `groupCols` (e.g. lang, source). Output:
    * (groupCols..., `n_docs`, `n_tokens`, `n_chars`,
    * `n_distinct_texts`, `max_tokens`, `mean_tokens`). Token counts are
    * [[TextFunctions.tokenCount]] (whitespace tokens; null text = 0).
    */
  def corpusReport(
      df: DataFrame,
      textCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "corpusReport needs at least one group col")
    val base = Par.fan(df).select(
      groupCols.map(col) ++ Seq(
        coalesce(TextFunctions.tokenCount(col(textCol)), lit(0L))
          .cast(LongType).as("__toks"),
        coalesce(length(col(textCol)), lit(0)).cast(LongType).as("__chars"),
        TextFunctions.hash61(coalesce(col(textCol), lit(""))).as("__h")): _*)
    base
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__toks")).as("n_tokens"),
        sum(col("__chars")).as("n_chars"),
        countDistinct(col("__h")).as("n_distinct_texts"),
        max(col("__toks")).as("max_tokens"),
        (sum(col("__toks")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("mean_tokens"))
  }

  /** Power-of-two sequence-length histogram — the input to packing/window
    * design (P21/P65: which capacity wastes the least padding?) and the
    * long-tail diagnostic (how much mass sits beyond the context length?).
    *
    * Bucket = number of binary digits of the token count (`length(bin(n))`
    * — EXACT integer log2+1, no float log anywhere; DuckDB's `bin` agrees
    * with `Long.toBinaryString` digit-for-digit), i.e. bucket k holds
    * docs with 2^(k−1) ≤ tokens < 2^k (bucket 1 additionally holds the
    * zero-token docs). One partial-agg shuffle of ≤64 bucket rows.
    */
  def lengthHistogram(docs: DataFrame, textCol: String): DataFrame =
    Par.fan(docs)
      .select(TextFunctions.tokenCount(col(textCol))
        .cast(LongType).as("__toks"))
      .select(length(bin(col("__toks"))).cast(IntegerType).as("bucket"),
        col("__toks"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__toks")).as("total_tokens"),
        min(col("__toks")).as("min_tokens"),
        max(col("__toks")).as("max_tokens"))

  /** Corpus drift report — the top-`k` tokens whose RELATIVE frequency
    * diverges most between two corpora (old vs refreshed crawl, planned
    * mixture vs materialized sample, train vs eval): the distribution
    * check a mixture/refresh pipeline runs before shipping. Per token:
    * raw counts, per-million rates in each corpus (exact
    * `⌊c·10⁶/T⌋`), and `delta_ppm = |rate_a − rate_b|`; ranked
    * (delta desc, token asc) — fully integer-exact and deterministic.
    *
    * Scale posture: one partial-agg'd token histogram per corpus (shuffle
    * carries one row per distinct token), a full-outer SortMergeJoin of
    * the two histograms on the token key, 1-row total relations broadcast
    * in, and the top-k a TakeOrderedAndProject — no global sort, nothing
    * corpus-sized past the histograms.
    */
  def corpusDrift(
      a: DataFrame,
      b: DataFrame,
      textCol: String,
      k: Int = 100): DataFrame = {
    require(k > 0, "k must be positive")
    def hist(df: DataFrame) = Par.fan(df)
      .select(explode(TextFunctions.words(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("c"))
    val ha = Par.cached(hist(a))
    val hb = Par.cached(hist(b))
    // DECIMAL(38,0) numerator: c·10⁶ overflows the exact-double window
    // (2⁵³) once a token tops ~9·10⁹ occurrences — real at 100 TB.
    // IntegralDivide on decimals keeps the floor exact at any corpus size.
    def intDiv(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      org.apache.spark.sql.graft.ColumnShim.column(
        org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          org.apache.spark.sql.graft.ColumnShim.expression(
            x.cast(org.apache.spark.sql.types.DecimalType(38, 0))),
          org.apache.spark.sql.graft.ColumnShim.expression(
            y.cast(org.apache.spark.sql.types.DecimalType(38, 0)))))
    val ta = ha.agg(coalesce(sum(col("c")), lit(0L)).as("__ta"))
    val tb = hb.agg(coalesce(sum(col("c")), lit(0L)).as("__tb"))
    // Loud in-plan emptiness guard: an empty side would make the ANSI
    // IntegralDivide throw an opaque divide-by-zero mid-job; name the
    // empty corpus instead (the mixturePlan/systematicSample guard style).
    def nonEmpty(t: Column, name: String): Column =
      when(
        t === 0L,
        raise_error(lit(
          s"corpusDrift: corpus $name has zero tokens - ppm rates undefined")))
        .otherwise(t)
    ha.withColumnRenamed("c", "count_a")
      .join(hb.withColumnRenamed("c", "count_b"), Seq("token"), "full_outer")
      .crossJoin(broadcast(ta))
      .crossJoin(broadcast(tb))
      .select(
        col("token"),
        coalesce(col("count_a"), lit(0L)).as("count_a"),
        coalesce(col("count_b"), lit(0L)).as("count_b"),
        intDiv(
          coalesce(col("count_a"), lit(0L)) * 1000000L,
          nonEmpty(col("__ta"), "a")).as("ppm_a"),
        intDiv(
          coalesce(col("count_b"), lit(0L)) * 1000000L,
          nonEmpty(col("__tb"), "b")).as("ppm_b"))
      .withColumn("delta_ppm", abs(col("ppm_a") - col("ppm_b")))
      .orderBy(col("delta_ppm").desc, col("token").asc)
      .limit(k)
  }
}
