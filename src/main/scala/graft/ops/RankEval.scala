package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

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

  /** Fixed ppm discount table for NDCG: `D[r] = round(10⁶ / log₂(r+1))`
    * for ranks 1..64, computed ONCE from `StrictMath` (platform-pinned)
    * and shared verbatim with the DuckDB oracle — the only log anywhere
    * is in this frozen constant, so the metric itself stays exact-integer
    * and engine-replayable (the P108 unigram-cost trade).
    */
  val DiscountPpm: IndexedSeq[Long] =
    (1 to 64).map(r =>
      math.round(1e6 / (StrictMath.log(r + 1.0) / StrictMath.log(2.0))))

  /** Per-query NDCG@k for GRADED relevance — the ranking metric that
    * credits putting HIGHLY relevant docs first, where [[perQuery]]'s
    * binary MRR/MAP treat all relevant docs alike. Integer contract:
    * `gain = 2^rel − 1` (rel clamped to [0, 16] so `dcg·10⁶` stays far
    * under 2⁶³), `dcg = Σ gain·D[rank]` over the top `k` with the frozen
    * [[DiscountPpm]] table, `idcg` the same sum over the query's rels
    * sorted (rel desc, doc asc), `ndcg_ppm = ⌊dcg·10⁶/idcg⌋` (0 when the
    * query has no positive rel). Duplicate defenses as [[perQuery]]:
    * best rank per doc, max grade per (query, doc).
    *
    * Output per judged query: (queryCol, n_rel, dcg, idcg, ndcg_ppm).
    * Scale posture: same as [[perQuery]] — (query, doc)-keyed joins, a
    * per-query window bounded by k (run side) / judged docs (ideal side).
    */
  def ndcgPerQuery(
      run: DataFrame,
      qrels: DataFrame,
      queryCol: String,
      docCol: String,
      rankCol: String,
      relCol: String,
      k: Int): DataFrame = {
    require(k >= 1 && k <= DiscountPpm.length,
      s"k must be in [1, ${DiscountPpm.length}] (the frozen discount table)")
    val disc = DiscountPpm // captured for the lambda below
    def discountAt(rank: Column): Column =
      element_at(
        array(disc.map(lit): _*), rank.cast(IntegerType))
    def gain(rel: Column): Column =
      (pow(lit(2.0), least(greatest(rel.cast(DoubleType), lit(0.0)), lit(16.0)))
        .cast(LongType) - 1L)
    val rels = Par.cached(
      Par.fan(qrels)
        .groupBy(col(queryCol).as("__q"), col(docCol).as("__d"))
        .agg(max(col(relCol).cast(LongType)).as("__rel")))
    val topK = Par.fan(run)
      .select(
        col(queryCol).as("__q"),
        col(docCol).as("__d"),
        col(rankCol).cast(LongType).as("__r"))
      .filter(col("__r") >= 1 && col("__r") <= k)
      .groupBy(col("__q"), col("__d"))
      .agg(min(col("__r")).as("__r"))
    val dcg = topK
      .join(rels, Seq("__q", "__d"))
      .groupBy(col("__q"))
      .agg(sum(gain(col("__rel")) * discountAt(col("__r"))).as("dcg"))
    val wIdeal = Window
      .partitionBy(col("__q"))
      .orderBy(col("__rel").desc, col("__d").asc)
    val idcg = rels
      .withColumn("__ir", row_number().over(wIdeal).cast(LongType))
      .filter(col("__ir") <= k)
      .groupBy(col("__q"))
      .agg(
        sum(gain(col("__rel")) * discountAt(col("__ir"))).as("idcg"),
        count(lit(1)).as("__n_top"))
    val nRel = rels.groupBy(col("__q")).agg(count(lit(1)).as("n_rel"))
    nRel
      .join(idcg.drop("__n_top"), Seq("__q"))
      .join(dcg, Seq("__q"), "left")
      .select(
        col("__q").as(queryCol),
        col("n_rel"),
        coalesce(col("dcg"), lit(0L)).as("dcg"),
        col("idcg"),
        when(col("idcg") === 0, lit(0L))
          .otherwise(
            Sampling.divFloor(
              coalesce(col("dcg"), lit(0L)) * lit(1000000L), col("idcg")))
          .as("ndcg_ppm"))
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
