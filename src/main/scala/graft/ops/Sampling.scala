package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Deterministic corpus sampling.
  *
  * Hash sampling (id hash mod N < threshold) is reproducible run-to-run and
  * engine-to-engine — the property random() sampling lacks and the reason
  * every serious data pipeline samples by hash: re-running the pipeline, or
  * re-deriving the sample in another system, selects the SAME documents.
  */
object Sampling {

  /** Per-mille sampling bucket of an id column (0-999, portable md5-derived
    * hash — DuckDB replays it exactly).
    */
  def bucket(idCol: Column): Column =
    TextFunctions.hash61(idCol.cast(StringType)) % 1000

  /** Stratified hash sampling: keep each row when its per-mille bucket
    * falls under its stratum's rate — the "downsample the dominant
    * language/source, keep the rare ones" pipeline step. `rates` maps
    * stratum value → keep-per-mille (0-1000); absent strata use
    * `defaultPerMille`.
    *
    * Scale posture: a pure per-row filter on a codegen'd hash — no shuffle,
    * no stratum histogram pass, and the selection is stable under
    * re-partitioning, retries and corpus growth (a kept id stays kept).
    */
  def stratifiedHashSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      rates: Map[String, Int],
      defaultPerMille: Int): DataFrame = {
    require(
      (rates.values ++ Seq(defaultPerMille)).forall(r => r >= 0 && r <= 1000),
      "per-mille rates must be in [0, 1000]")
    val rate = rates.foldLeft(lit(defaultPerMille)) { case (acc, (k, r)) =>
      when(col(strataCol) === lit(k), lit(r)).otherwise(acc)
    }
    df.filter(bucket(col(idCol)) < rate)
  }
}
