package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Count-Min sketch: approximate per-key frequencies over a key space too
  * large for an exact histogram, in bounded `width × depth` space — the
  * companion of [[HeavyHitters]] (which finds WHICH keys are hot; this
  * answers "how hot is key X" for any asked key).
  *
  * Unlike Misra-Gries, Count-Min is a LINEAR sketch — counters are plain
  * sums, so the result is independent of partitioning and merge order and
  * therefore exactly reproducible (and oracle-gatable). Guarantees
  * (Cormode & Muthukrishnan 2005): est ≥ true, and with width w the
  * overestimate is ≤ n/w in expectation per depth row (the min over
  * `depth` independent rows makes large overestimates exponentially
  * unlikely).
  *
  * Spark-first: the sketch IS a DataFrame `(r, bucket, cnt)` — built with
  * one partial-agg'd shuffle whose output is capped at `width × depth`
  * rows per map partition regardless of key cardinality; estimates are a
  * broadcast-friendly join against it. Store the sketch table in parquet
  * and re-query it forever without touching the corpus.
  */
object CountMin {

  /** Bucket of `key` for depth row `r` — portable md5-derived hash, so
    * the DuckDB oracle replays it exactly.
    */
  def bucket(key: Column, r: Column, width: Int): Column =
    TextFunctions.hash61(
      concat(lit("cms"), r.cast(StringType), lit(":"), key.cast(StringType))
    ) % width

  /** Build the sketch: one row per non-empty `(r, bucket)` cell with its
    * total count. Nulls are skipped.
    */
  def sketch(
      df: DataFrame,
      key: Column,
      width: Int,
      depth: Int): DataFrame = {
    require(width > 0 && depth > 0, "width and depth must be positive")
    df.select(key.cast(StringType).as("__cms_key"))
      .na
      .drop(Seq("__cms_key"))
      .select(
        col("__cms_key"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .groupBy(col("r"), bucket(col("__cms_key"), col("r"), width).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Estimated counts for `probe`'s keys against a built sketch:
    * `(key, est)` with `est = min over depth rows of the key's cell`
    * (0 for keys hashing only to empty cells). `depth` and `width` must
    * match the values the sketch was built with.
    */
  def estimates(
      sketchDf: DataFrame,
      probe: DataFrame,
      probeKey: String,
      width: Int,
      depth: Int): DataFrame = {
    val p = probe
      .select(col(probeKey).cast(StringType).as(probeKey))
      .withColumn("r", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn("bucket", bucket(col(probeKey), col("r"), width))
    p.join(sketchDf, Seq("r", "bucket"), "left")
      .groupBy(col(probeKey))
      .agg(min(coalesce(col("cnt"), lit(0L))).cast(LongType).as("est"))
  }
}
