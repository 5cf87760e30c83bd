package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Rank-aware retrieval evaluation — MRR, MAP and hit@k of a ranked run
  * against relevance judgments (qrels): the metrics that grade a
  * retrieval stack (BM25 [[Bm25]], dense ANN [[IvfInt]], hybrid
  * [[RankFusion]]) on WHERE it puts the relevant documents, where P80's
  * recall@k only asks whether they appear at all.
  *
  * EXACT INTEGER contract (engine-portable, hash-gateable — the repo's
  * FP-determinism rule): with ranks 1-based and judged relevance binary,
  * per query over the top `k`:
  *
  *   - `rr_ppm  = ⌊10⁶ / first_rel_rank⌋` (0 when no relevant doc ranks),
  *   - `ap_ppm  = ⌊(Σ_j ⌊10⁶·j / rank_j⌋) / n_rel⌋` — the j-th relevant
  *     hit in rank order contributes precision-at-its-rank `j/rank_j`,
  *     each term floored at ppm scale THEN summed (the documented
  *     integer-AP contract: per-term flooring makes the sum associative
  *     and replayable, at ≤ n_rel ppm absolute error vs float AP),
  *   - `n_hits_at_k`, `first_rank` (0 = miss), `n_rel` as exact counts.
  *
  * Malformed-input defenses (the AnnEval advice pattern): qrels pairs are
  * collapsed to distinct, and a doc appearing at several ranks of one
  * query keeps its BEST rank — duplicates cannot push a metric past 10⁶.
  *
  * Scale posture: qrels and run shuffle once each on (query, doc) for the
  * dedup + hit join; the per-query window is bounded by `k` rows per
  * query (never corpus-wide); the per-query aggregate is partial-agg'd.
  * Nothing query-set-sized sits on the driver.
  */
object RankEval {

  /** Per-query metrics of `run` (queryCol, docCol, rankCol — 1-based)
    * against `qrels` (queryCol, docCol). One row per judged query:
    * (queryCol, n_rel, n_hits_at_k, first_rank, rr_ppm, ap_ppm).
    * Queries present only in the run (no judgments) are NOT scored —
    * standard trec-eval semantics.
    */
  def perQuery(
      run: DataFrame,
      qrels: DataFrame,
      queryCol: String,
      docCol: String,
      rankCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val rels = Par.cached(
      Par.fan(qrels)
        .select(col(queryCol).as("__q"), col(docCol).as("__d"))
        .distinct())
    val nRel = rels.groupBy(col("__q")).agg(count(lit(1)).as("n_rel"))
    val topK = Par.fan(run)
      .select(
        col(queryCol).as("__q"),
        col(docCol).as("__d"),
        col(rankCol).cast(LongType).as("__r"))
      .filter(col("__r") >= 1 && col("__r") <= k)
      .groupBy(col("__q"), col("__d"))
      .agg(min(col("__r")).as("__r")) // duplicate doc keeps its best rank
    val hits = topK.join(rels, Seq("__q", "__d"))
    // ≤ k hit rows per query; rank ties (malformed runs) broken by doc so
    // the j-th-hit numbering stays deterministic
    val w = Window.partitionBy(col("__q")).orderBy(col("__r"), col("__d"))
    val perQ = hits
      .withColumn("__j", row_number().over(w).cast(LongType))
      .groupBy(col("__q"))
      .agg(
        count(lit(1)).as("n_hits_at_k"),
        min(col("__r")).as("__first"),
        sum(Sampling.divFloor(lit(1000000L) * col("__j"), col("__r")))
          .as("__apnum"))
    nRel
      .join(perQ, Seq("__q"), "left")
      .select(
        col("__q").as(queryCol),
        col("n_rel"),
        coalesce(col("n_hits_at_k"), lit(0L)).as("n_hits_at_k"),
        coalesce(col("__first"), lit(0L)).as("first_rank"),
        when(col("__first").isNull, lit(0L))
          .otherwise(Sampling.divFloor(lit(1000000L), col("__first")))
          .as("rr_ppm"),
        Sampling.divFloor(coalesce(col("__apnum"), lit(0L)), col("n_rel"))
          .as("ap_ppm"))
  }

  /** Corpus-level roll-up of [[perQuery]] output: one row
    * (n_queries, mrr_ppm, map_ppm, hit_rate_ppm) — each metric the floor
    * mean of its per-query ppm (hit rate = queries with ≥1 hit).
    */
  def summary(perQueryDf: DataFrame): DataFrame =
    perQueryDf
      .agg(
        count(lit(1)).as("n_queries"),
        coalesce(sum(col("rr_ppm")), lit(0L)).as("__rr"),
        coalesce(sum(col("ap_ppm")), lit(0L)).as("__ap"),
        coalesce(
          sum(when(col("n_hits_at_k") > 0, 1L).otherwise(0L)), lit(0L))
          .as("__hits"))
      .select(
        col("n_queries"),
        Sampling.divFloor(col("__rr"), greatest(col("n_queries"), lit(1L)))
          .as("mrr_ppm"),
        Sampling.divFloor(col("__ap"), greatest(col("n_queries"), lit(1L)))
          .as("map_ppm"),
        Sampling.divFloor(
          col("__hits") * lit(1000000L), greatest(col("n_queries"), lit(1L)))
          .as("hit_rate_ppm"))
}
