package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking (the Deequ/expectations
  * pattern): evaluate a set of named row predicates, key-uniqueness and
  * referential-integrity constraints over a table and emit ONE small
  * report relation `(check, n_violations, n_rows, pass)` — the
  * contract-gate every production ingest runs before publishing a
  * partition.
  *
  * Scale posture: [[predicateReport]] folds ALL predicates into a single
  * aggregate pass (`sum(when(!p, 1))` per check — map-side partial
  * aggregation, one 1-row reduction, NO per-check scans);
  * [[uniqueReport]] is one partial-agg'd key exchange;
  * [[fkReport]] distincts the child keys first (partial-agg) and
  * left-antis the (small) distinct set against the parent — the probe
  * table never reshuffles its payload. Reports are check-count-sized,
  * never data-sized.
  */
object DataQuality {

  private val cols = Seq("check_name", "n_violations", "n_rows", "pass")

  /** All row-level predicates in ONE scan: each `(name, holds)` pair
    * contributes a violation count `sum(holds ? 0 : 1)` (null predicate
    * results count as violations — an unknown is not a pass). Internal
    * columns are POSITIONAL (`__v_0`, `__v_1`, …) — check names appear
    * only as literals in the report, so names carrying dots, backticks
    * or duplicates can't break column resolution. Zero input rows report
    * 0 violations, pass = 1 (the sums are coalesced).
    */
  def predicateReport(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "predicateReport needs at least one check")
    val aggs = count(lit(1)).as("__n") +: checks.zipWithIndex.map {
      case ((_, holds), i) =>
        sum(when(coalesce(holds, lit(false)), 0L).otherwise(1L)).as(s"__v_$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = checks.zipWithIndex.map { case ((name, _), i) =>
      struct(
        lit(name).as("check_name"),
        coalesce(col(s"__v_$i"), lit(0L)).as("n_violations"),
        col("__n").as("n_rows"))
    }
    one
      .select(explode(array(stacked: _*)).as("r"))
      .select(
        col("r.check_name"),
        col("r.n_violations"),
        col("r.n_rows"),
        (col("r.n_violations") === 0L).cast("int").as("pass"))
  }

  /** Key-uniqueness constraint: `n_violations` = rows carrying a
    * duplicated key (all members of multi-row keys count, matching the
    * "rows you would have to quarantine" reading).
    */
  def uniqueReport(df: DataFrame, keyCols: Seq[String], name: String): DataFrame = {
    require(keyCols.nonEmpty, "uniqueReport needs at least one key column")
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .agg(
        coalesce(sum(when(col("__c") > 1L, col("__c"))), lit(0L))
          .as("n_violations"),
        // coalesce: zero input rows must report (0, 0, pass) like fkReport
        coalesce(sum(col("__c")), lit(0L)).as("n_rows"))
      .select(
        lit(name).as("check_name"),
        col("n_violations"),
        col("n_rows"),
        (col("n_violations") === 0L).cast("int").as("pass"))
  }

  /** Referential integrity: `n_violations` = child rows whose key has no
    * parent (null child keys are orphans — use a predicate check to
    * allow/track nulls separately if they are legal).
    */
  def fkReport(
      child: DataFrame,
      childKey: String,
      parent: DataFrame,
      parentKey: String,
      name: String): DataFrame = {
    // one pass over the child (the groupBy), one distinct-key outer join,
    // one 1-row agg: orphan rows AND the total come from the same grouped
    // relation — no second child scan, no driver-side count
    val grouped = child
      .groupBy(col(childKey).as("__k"))
      .agg(count(lit(1)).as("__c"))
    grouped
      .join(
        parent.select(col(parentKey).as("__k"), lit(1).as("__p")).distinct(),
        Seq("__k"),
        "left_outer")
      .agg(
        coalesce(sum(when(col("__p").isNull, col("__c"))), lit(0L))
          .as("n_violations"),
        coalesce(sum(col("__c")), lit(0L)).as("n_rows"))
      .select(
        lit(name).as("check_name"),
        col("n_violations"),
        col("n_rows"),
        (col("n_violations") === 0L).cast("int").as("pass"))
  }

  /** Union several report relations into one ordered report. */
  def combine(reports: DataFrame*): DataFrame = {
    require(reports.nonEmpty, "combine needs at least one report")
    reports.reduce(_ unionByName _).select(cols.map(col): _*)
  }
}
