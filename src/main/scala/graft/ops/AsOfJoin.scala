package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join (the operator behind time-series enrichment —
  * DuckDB `ASOF JOIN`, kdb `aj`, pandas `merge_asof`).
  *
  * For each left row, attach the payload of the latest right row with the
  * same key and `rightTime <= leftTime` (left rows with no match keep null
  * payloads — left-asof semantics).
  *
  * Spark-first plan: instead of a range join (quadratic per key) this uses
  * the union-and-window formulation — one shuffle on the key, one sort per
  * partition, linear scan: tag both sides, union, and carry the last
  * non-null right payload forward over (key, time) order. At 100 TB this is
  * shuffle-minimal (single exchange of left+right) and skew-safe under AQE.
  *
  * Ties (multiple right rows at the same timestamp) resolve to an arbitrary
  * one unless `tieBreak` orders them — same contract as DuckDB's ASOF.
  */
object AsOfJoin {

  def leftAsOf(
      left: DataFrame,
      leftTime: String,
      right: DataFrame,
      rightTime: String,
      keys: Seq[(String, String)], // (left key col, right key col)
      payload: Seq[String], // right columns to attach
      tieBreak: Option[String] = None): DataFrame = {
    val Tag = "__graft_is_left"
    val T = "__graft_t"
    val Tie = "__graft_tie"
    val P = "__graft_payload"

    val leftCols = left.columns.toSeq

    // Payload travels as ONE struct filled atomically: per-column
    // last(c, ignoreNulls) windows would substitute a stale value from an
    // older right row wherever the matched row holds a null, and could stitch
    // different payload columns from different right rows — diverging from
    // ASOF/merge_asof semantics. A struct built from a right row is never
    // null (even if its fields are), so last(struct, ignoreNulls) always
    // attaches the single latest right row as a unit.
    val payloadStruct = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c)))

    val lSide = left.select(
      leftCols.map(col) :+
        col(leftTime).as(T) :+
        lit(1).as(Tag) :+
        lit(null).cast("long").as(Tie) :+
        lit(null).cast(payloadStruct).as(P): _*)

    val rKeyed = keys.foldLeft(right) { case (df, (lk, rk)) =>
      if (lk == rk) df else df.withColumnRenamed(rk, lk)
    }
    val rSide = rKeyed.select(
      leftCols.map(c =>
        if (keys.exists(_._1 == c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+
        col(rightTime).as(T) :+
        lit(0).as(Tag) :+
        tieBreak
          .map(tb => col(tb).cast("long").as(Tie))
          .getOrElse(lit(0L).as(Tie)) :+
        struct(payload.map(col): _*).as(P): _*)

    val unioned = lSide.unionByName(rSide)

    // right rows sort before left rows at equal timestamps so `>=` matches;
    // tie-break orders equal right timestamps deterministically
    val w = Window
      .partitionBy(keys.map(k => col(k._1)): _*)
      .orderBy(col(T).asc, col(Tag).asc, col(Tie).asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn(P, last(col(P), ignoreNulls = true).over(w))
      .filter(col(Tag) === 1)
      .select(
        leftCols.map(col) ++
          payload.map(c => col(P).getField(c).as(c)): _*)
  }

  /** Column helper: expose as-of output columns of a payload col. */
  def payloadCol(name: String): Column = col(name)
}
