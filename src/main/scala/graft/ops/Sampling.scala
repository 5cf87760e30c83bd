package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

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

  /** Deterministic weighted corpus mixing: emit each row
    * `weight/1000` times — the "3× books, 0.3× common-crawl" resampling
    * step that turns per-source mixture weights into a physical training
    * corpus. A weight of 2500‰ yields 2 copies of every row plus a third
    * for the 50% of ids whose hash bucket falls under the fraction; weights
    * under 1000‰ degenerate to stratified downsampling. Output carries a
    * 0-based `copyCol` so downstream shuffles can spread replicas.
    *
    * Scale posture: a per-row codegen'd hash decides the copy count and
    * `explode(sequence)` emits them map-side — no shuffle, no stratum
    * histogram, stable under repartitioning/retries/corpus growth (same
    * determinism contract as [[stratifiedHashSample]]).
    */
  def weightedMix(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      weightsPerMille: Map[String, Int],
      defaultPerMille: Int,
      copyCol: String = "copy"): DataFrame = {
    require(
      (weightsPerMille.values ++ Seq(defaultPerMille)).forall(_ >= 0),
      "per-mille weights must be non-negative")
    val w = weightsPerMille.foldLeft(lit(defaultPerMille)) {
      case (acc, (k, r)) => when(col(strataCol) === lit(k), lit(r)).otherwise(acc)
    }
    val frac = pmod(w, lit(1000))
    // integer arithmetic only (subtract-the-remainder division stays exact)
    val base = ((w - frac) / 1000).cast(LongType)
    val n = base + when(bucket(col(idCol)) < frac, lit(1L)).otherwise(lit(0L))
    df.withColumn("__n_copies", n)
      .filter(col("__n_copies") > 0)
      .withColumn(copyCol, explode(sequence(lit(0L), col("__n_copies") - 1)))
      .drop("__n_copies")
  }
}
