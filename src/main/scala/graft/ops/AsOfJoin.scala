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

    val leftCols = left.columns.toSeq
    val payloadTypes =
      payload.map(c => c -> right.schema(c).dataType).toMap

    val lSide = left.select(
      (leftCols.map(col) :+
        col(leftTime).as(T) :+
        lit(1).as(Tag) :+
        lit(null).cast("long").as(Tie)) ++
        payload.map(c => lit(null).cast(payloadTypes(c)).as(c)): _*)

    val rKeyed = keys.foldLeft(right) { case (df, (lk, rk)) =>
      if (lk == rk) df else df.withColumnRenamed(rk, lk)
    }
    val rSide = rKeyed.select(
      (leftCols.map(c =>
        if (keys.exists(_._1 == c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+
        col(rightTime).as(T) :+
        lit(0).as(Tag) :+
        tieBreak
          .map(tb => col(tb).cast("long").as(Tie))
          .getOrElse(lit(0L).as(Tie))) ++
        payload.map(c => col(c)): _*)

    val unioned = lSide.unionByName(rSide)

    // right rows sort before left rows at equal timestamps so `>=` matches;
    // tie-break orders equal right timestamps deterministically
    val w = Window
      .partitionBy(keys.map(k => col(k._1)): _*)
      .orderBy(col(T).asc, col(Tag).asc, col(Tie).asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }

    filled
      .filter(col(Tag) === 1)
      .drop(T, Tag, Tie)
  }

  /** Column helper: expose as-of output columns of a payload col. */
  def payloadCol(name: String): Column = col(name)
}
