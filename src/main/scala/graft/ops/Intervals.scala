package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-union aggregation ("gaps and islands"): per key, merge
  * overlapping half-open intervals `[start, end)` and report coverage —
  * total covered length, merged-island count, raw interval count. The
  * relational workhorse behind coverage/utilization questions (machine
  * busy-time from overlapping jobs, user active-time from sessions,
  * in-transit days from shipments) that naive `sum(end - start)`
  * double-counts.
  *
  * Spark-first plan: ONE hash exchange on the key, then two window
  * passes over the same (key, start, end, tie) sort — a running
  * `max(end)` over strictly-preceding rows marks island openers
  * (`start >= prev_max` fails only inside an overlap), and a running
  * sum of the opener flags numbers the islands; a final per-(key,
  * island) aggregation (partial-agg friendly) computes
  * `max(end) − min(start)` per island before the per-key rollup. No
  * self-join, no range join, linear per partition — the same
  * single-exchange posture as [[Scd]] at 100 TB, skew-safe under AQE.
  *
  * Intervals are half-open and integer-valued (epoch days/seconds —
  * caller's choice); empty/negative intervals (`end <= start`) are
  * dropped as degenerate. `tie` makes the within-key sort total so the
  * running max is engine-reproducible under equal starts.
  */
object Intervals {

  /** Per-key interval-union coverage over half-open integer intervals
    * `[start, end)`: `(key..., n_intervals, n_islands, covered)` where
    * islands are maximal overlap-connected groups (exact adjacency does
    * not merge — half-open intervals touching at a point share nothing)
    * and `covered` counts each unit once however many intervals overlap
    * it.
    *
    * Scale posture: ONE hash exchange on the key + two window passes over
    * the same sort (running max(end) marks island openers, running sum
    * numbers islands), then a partial-agg-friendly per-island rollup; no
    * self-join, no range join, linear per partition, skew-safe under AQE.
    */
  def coverage(
      df: DataFrame,
      keyCols: Seq[String],
      startCol: Column,
      endCol: Column,
      tieCol: Column): DataFrame = {
    require(keyCols.nonEmpty, "coverage needs at least one key column")
    val keys: Seq[Column] = keyCols.map(col)
    val base = df
      .select(keys ++ Seq(
        startCol.cast("long").as("__s"),
        endCol.cast("long").as("__e"),
        tieCol.as("__tie")): _*)
      .filter(col("__e") > col("__s"))

    val order = Seq(col("__s").asc, col("__e").asc, col("__tie").asc)
    val wPrev = Window.partitionBy(keys: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(keys: _*).orderBy(order: _*)

    base
      .withColumn("__prev_max", max(col("__e")).over(wPrev))
      .withColumn(
        "__opens",
        (col("__prev_max").isNull || col("__s") >= col("__prev_max"))
          .cast("long"))
      .withColumn("__island", sum(col("__opens")).over(wRun))
      .groupBy(keys :+ col("__island"): _*)
      .agg(
        count(lit(1)).as("__n"),
        min(col("__s")).as("__is"),
        max(col("__e")).as("__ie"))
      .groupBy(keys: _*)
      .agg(
        sum(col("__n")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("__ie") - col("__is")).as("covered"))
  }
}
