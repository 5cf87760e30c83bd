package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANN quality evaluation — recall@k of an approximate top-k result
  * against an exact (or reference) top-k over the same queries. Every ANN
  * deployment needs this measured, not assumed: recall is the knob that
  * justifies nprobe/bands/code-size choices, and it must be re-measured
  * whenever the corpus distribution drifts.
  *
  * Exact integer output — hit counts and ppm ratios — so when both inputs
  * are themselves deterministic (the integer-exact IVF / quantized
  * brute-force pair), the whole evaluation is engine-replayable and
  * hash-gateable.
  *
  * Scale posture: both inputs are |queries|·k rows — evaluation cost is
  * query-bounded, never corpus-bounded. One equi-join on (query, neighbor)
  * + one per-query partial agg.
  */
object AnnEval {

  /** Per-query recall of `ann` against `truth` (both (queryCol,
    * neighborCol) frames, typically k rows per query).
    *
    * Both inputs are de-duplicated on (query, neighbor) before counting,
    * so repeated pair rows cannot inflate hits past 100%.
    *
    * Output: (queryCol, n_truth, n_hits, recall_ppm) — one row per query
    * appearing in `truth`; `recall_ppm = ⌊n_hits · 10⁶ / n_truth⌋` exact.
    * Queries the ANN missed entirely score 0 (they appear via the left
    * join, not silently vanish — the failure mode recall exists to catch).
    */
  def recallAtK(
      ann: DataFrame,
      truth: DataFrame,
      queryCol: String,
      neighborCol: String): DataFrame = {
    // Pair-distinct both sides: a duplicated (query, neighbor) row in
    // either input would inflate n_hits through the equi-join and could
    // report recall_ppm above 10^6 - malformed inputs must not look
    // better than perfect.
    val t = Par.fan(truth)
      .select(col(queryCol).as("__q"), col(neighborCol).as("__n"))
      .distinct()
    val a = Par.fan(ann)
      .select(col(queryCol).as("__q"), col(neighborCol).as("__n"))
      .distinct()
    val hits = a.join(t, Seq("__q", "__n"))
      .groupBy(col("__q"))
      .agg(count(lit(1)).as("n_hits"))
    t.groupBy(col("__q"))
      .agg(count(lit(1)).as("n_truth"))
      .join(hits, Seq("__q"), "left")
      .select(
        col("__q").as(queryCol),
        col("n_truth"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        org.apache.spark.sql.graft.ColumnShim.column(
          org.apache.spark.sql.catalyst.expressions.IntegralDivide(
            org.apache.spark.sql.graft.ColumnShim.expression(
              coalesce(col("n_hits"), lit(0L)) * lit(1000000L)),
            org.apache.spark.sql.graft.ColumnShim.expression(col("n_truth"))))
          .as("recall_ppm"))
  }
}
