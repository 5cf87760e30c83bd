package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed point-in-interval (range) join — "which intervals contain
  * this point" — without the cartesian product Spark plans for a raw
  * `p BETWEEN lo AND hi` condition (BroadcastNestedLoopJoin, O(|P|·|I|)
  * comparisons: a scale killer the moment neither side broadcasts).
  *
  * The standard bucketization trick: pick a bucket width `B`; each point
  * lands in bucket ⌊p/B⌋, each interval replicates to every bucket its
  * span touches (⌊lo/B⌋ … ⌊hi/B⌋). The join becomes an EQUI-join on the
  * bucket id (plus any exact keys) with the exact `lo ≤ p ≤ hi` residual
  * re-checked after the match — results are EXACTLY those of the naive
  * join (spec'd), bucketization only prunes the pair space.
  *
  * Scale posture (100 TB): shuffle = |P| + |I|·(mean span / B + 1) rows,
  * hashed on (keys…, bucket) — pick `B` near the median interval width so
  * the replication factor stays O(1); a single giant interval replicates
  * to span/B buckets (map-side Generate, no driver involvement) up to a
  * loud `maxReplication` guard (default 1e6 — a sentinel hi=Long.MaxValue
  * interval raises instead of OOMing a task), and a
  * hot bucket is ordinary equi-join skew — AQE's skew split applies, or
  * feed a larger `B`. Floor-division is exact integer arithmetic
  * (`(x − pmod(x, B)) div B`, correct for negative values too — no
  * double rounding at nano-epoch magnitudes where doubles lose exactness).
  */
object RangeJoin {

  /** Exact floor division `⌊x / b⌋` for long columns (pmod keeps the
    * remainder non-negative, so the subtraction divides exactly; `div` is
    * Spark's integer division — safe for values beyond 2^53 where a
    * double round-trip is not).
    */
  def floorDiv(x: Column, b: Long): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graft.ColumnShim.expression(
          (x - pmod(x, lit(b))).cast(LongType)),
        org.apache.spark.sql.graft.ColumnShim.expression(lit(b))))

  /** Join `points` to the `intervals` that contain them:
    * `pointCol ∈ [loCol, hiCol]` (inclusive both ends), optionally also
    * matching exact key pairs `(point key, interval key)`. All three
    * range columns must be LONG (epoch micros, positions, …). Output:
    * every `points` column + every `intervals` column (callers project).
    * Empty intervals (`lo > hi`) match nothing; rows with a null range
    * value match nothing.
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bucket: Long,
      keys: Seq[(String, String)] = Nil,
      maxReplication: Long = 1000000L): DataFrame = {
    require(bucket > 0, "bucket width must be positive")
    require(maxReplication > 0, "maxReplication must be positive")
    val p = Par.fan(points).withColumn("__b", floorDiv(col(pointCol), bucket))
    // Guard against pathological spans: an open-ended sentinel interval
    // (hi = Long.MaxValue) would ask `sequence` for quintillions of bucket
    // ids — Spark's sequence-length error at best, a task OOM at worst.
    // Fail loudly with the offending span instead; callers with genuine
    // open-ended intervals must clamp hi to the data's max point (or
    // raise `bucket`) before the join.
    val span = floorDiv(col(hiCol), bucket) - floorDiv(col(loCol), bucket)
    val checkedHi = when(
      span >= maxReplication,
      raise_error(concat(
        lit(s"RangeJoin: interval [${loCol}, ${hiCol}] spans "),
        (span + 1).cast(StringType),
        lit(s" buckets of width $bucket (max $maxReplication) — clamp " +
          "open-ended intervals or raise the bucket width")))
        .cast(LongType)).otherwise(floorDiv(col(hiCol), bucket))
    val i = Par.fan(intervals)
      .filter(col(loCol) <= col(hiCol))
      .withColumn(
        "__b",
        explode(sequence(floorDiv(col(loCol), bucket), checkedHi)))
    val cond = keys
      .map { case (pk, ik) => p(pk) === i(ik) }
      .foldLeft(
        p("__b") === i("__b") &&
          p(pointCol) >= i(loCol) && p(pointCol) <= i(hiCol))(_ && _)
    p.join(i, cond)
      .drop(p("__b"))
      .drop(i("__b"))
  }
}
