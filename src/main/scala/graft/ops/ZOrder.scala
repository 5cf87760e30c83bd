package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order (Morton) data layout: interleave the bits of several key
  * columns into one sort key so that range-partitioned, min/max-indexed
  * files stay selective on EVERY key, not just the leading one — the
  * standard lakehouse technique for "prune by domain AND by date" over
  * parquet statistics at 100 TB (a plain sort is selective only on its
  * first column).
  *
  * Everything is exact integer bit arithmetic on non-negative longs —
  * deterministic across runs, partitionings and engines (the DuckDB
  * oracle replays the same shift/mask sum bit-for-bit).
  *
  * Usage: `df.repartitionByRange(n, zValue(cols))` +
  * `sortWithinPartitions` before the write; each output file then covers
  * a compact hyper-rectangle of the key space, and per-file min/max
  * column statistics prune on any of the interleaved keys (spec'd: a
  * narrow predicate on either key overlaps only a small fraction of the
  * z-ranged partitions, vs ~all partitions for the trailing key of a
  * plain lexicographic layout).
  */
object ZOrder {

  /** Morton value of `cols` (non-negative longs; values are masked to the
    * low `bits` bits): bit `i` of column `j` lands at position
    * `i * cols.size + j`. `cols.size * bits` must fit in 63 bits.
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(bits > 0, "bits must be positive")
    val d = cols.size
    require(
      d * bits <= 63,
      s"$d cols x $bits bits = ${d * bits} interleaved bits; max 63")
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftright(c.cast(LongType), i).bitwiseAND(lit(1L)) *
      lit(1L << (i * d + j))
    terms.reduce(_ + _)
  }

  /** Two-key convenience. */
  def zValue2(a: Column, b: Column, bits: Int = 21): Column =
    zValue(Seq(a, b), bits)

  /** Range-partition `df` into `numPartitions` by the Morton value of
    * `keyCols` and sort within partitions — the layout step before a
    * parquet write whose files should prune on every key.
    */
  def zorderRepartition(
      df: DataFrame,
      keyCols: Seq[String],
      bits: Int,
      numPartitions: Int): DataFrame = {
    val z = zValue(keyCols.map(col), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
