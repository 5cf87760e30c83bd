package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.types.StringType

/** Misra-Gries heavy hitters: the `k` (approximately) most frequent keys of
  * a column in ONE pass with O(k) memory per task and NO shuffle of the
  * key stream — the scale path for "what are the hot tokens/domains/urls"
  * on a corpus where the exact histogram ([[TfIdf]], `t_top_bigrams`)
  * would shuffle billions of distinct keys.
  *
  * Guarantees (Misra-Gries 1982; merge per Agarwal et al., "Mergeable
  * Summaries", PODS'12 — both hold REGARDLESS of partitioning or merge
  * order, which is what the spec asserts, since the exact estimates do
  * depend on Spark's nondeterministic merge order):
  *   - every key with true count > n/(k+1) is present in the summary
  *   - estimates UNDERCOUNT: est ≤ true ≤ est + err, with the summary-wide
  *     `err` ≤ n/(k+1)
  *
  * Execution: `treeAggregate` over the rows — per-partition sketches merge
  * tree-wise on executors, the driver receives one O(k) map. The classic
  * decrement-all step amortizes to O(1) per item (each decrement event
  * consumes k+1 units of inserted count, so events ≤ n/(k+1)).
  */
object HeavyHitters {

  /** One merged sketch: key → underestimate, the summary-wide error bound
    * (max undercount of any estimate, and of any absent key's count), and
    * the total item count n.
    */
  final case class Summary(counts: Map[String, Long], err: Long, n: Long)

  private type Sketch = (mutable.HashMap[String, Long], Long, Long)

  private def insert(s: Sketch, key: String, k: Int): Sketch = {
    val (m, err, n) = s
    if (m.contains(key) || m.size < k) {
      m.update(key, m.getOrElse(key, 0L) + 1L)
      (m, err, n + 1L)
    } else {
      // full and unseen: decrement every counter (the new item's single
      // unit is consumed too), dropping zeros
      m.filterInPlace((_, c) => c > 1L)
      m.mapValuesInPlace((_, c) => c - 1L)
      (m, err + 1L, n + 1L)
    }
  }

  private def merge(a: Sketch, b: Sketch, k: Int): Sketch = {
    val (ma, ea, na) = a
    val (mb, eb, nb) = b
    val small = if (ma.size <= mb.size) ma else mb
    val big = if (ma.size <= mb.size) mb else ma
    small.foreach { case (ky, c) => big.update(ky, big.getOrElse(ky, 0L) + c) }
    var err = ea + eb
    if (big.size > k) {
      // subtract the (k+1)-th largest count from every counter
      val d = big.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      big.filterInPlace((_, c) => c > d)
      big.mapValuesInPlace((_, c) => c - d)
      err += d
    }
    (big, err, na + nb)
  }

  /** One-pass sketch of the `key` column (nulls skipped). The driver holds
    * exactly one O(k) map — never row data.
    */
  def sketch(df: DataFrame, key: Column, k: Int): Summary = {
    require(k > 0, "k must be positive")
    val rows = df
      .select(key.cast(StringType).as("__hh_key"))
      .na
      .drop(Seq("__hh_key"))
    val (m, err, n) = rows.rdd
      .map(_.getString(0))
      .treeAggregate[Sketch]((mutable.HashMap.empty[String, Long], 0L, 0L))(
        insert(_, _, k),
        merge(_, _, k))
    Summary(m.toMap, err, n)
  }

  /** [[sketch]] as a DataFrame: `(key, est_count, err, n)` — est_count is
    * an underestimate, true count ∈ [est_count, est_count + err]; any key
    * with true count > n/(k+1) is guaranteed a row.
    */
  def topK(df: DataFrame, key: Column, k: Int): DataFrame = {
    val s = sketch(df, key, k)
    val spark = df.sparkSession
    import spark.implicits._
    s.counts.toSeq
      .map { case (ky, c) => (ky, c, s.err, s.n) }
      .toDF("key", "est_count", "err", "n")
  }
}
