package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (RRF) of independently ranked candidate lists —
  * the standard hybrid-retrieval combiner (Cormack, Clarke & Büttcher,
  * SIGIR 2009): fusing a sparse/keyword ranking ([[Bm25]]) with a dense/
  * embedding ranking ([[Similarity.bruteForceTopK]]) for benchmark
  * decontamination-by-retrieval, eval mining, and "find documents about X"
  * curation queries where neither signal alone recalls everything.
  *
  * Score of document d = Σ over lists containing d of `scale div (k0 +
  * rank_d)` — EXACT INTEGER reciprocal contributions (`div`, not float
  * division), so fused scores are sums of integers: deterministic under
  * any partitioning/merge order, engine-portable, hash-gateable. `k0`
  * (default 60, the paper's constant) damps the head so one list's #1
  * cannot dominate both lists' #10s.
  *
  * Scale posture (100 TB): the inputs are ALREADY top-k lists — the
  * expensive corpus passes live in the rankers. Fusion unions O(Σ kᵢ)
  * rows, one partial-agg'd shuffle on the id, and the final rank window
  * sits behind a TakeOrdered bounded by `topK` (the [[Bm25]] tail
  * pattern) — never by the corpus.
  */
object RankFusion {

  /** Fuse `lists` (each carrying `idCol` + `rankCol`, rank 1 = best).
    * Output: (`idCol`, `n_lists` = lists containing the id, `rrf_micro` =
    * integer fused score, `rank`), ties broken by id ascending.
    */
  def rrf(
      lists: Seq[DataFrame],
      idCol: String,
      rankCol: String,
      k0: Int = 60,
      scale: Long = 1000000L,
      topK: Int = 100): DataFrame = {
    require(lists.nonEmpty, "rrf needs at least one ranked list")
    require(k0 >= 0, s"k0 must be >= 0 (got $k0)")
    require(topK >= 1, s"topK must be >= 1 (got $topK)")
    val contribs = lists
      .map(_.select(
        col(idCol).as("__id"),
        expr(s"${scale}L div (${k0}L + `$rankCol`)").as("__c")))
      .reduce(_.unionAll(_))
    contribs
      .groupBy(col("__id"))
      .agg(
        count(lit(1)).as("n_lists"),
        sum(col("__c")).as("rrf_micro"))
      .orderBy(col("rrf_micro").desc, col("__id").asc)
      .limit(topK)
      // topK rows survive the TakeOrdered — the unpartitioned rank window
      // is bounded by topK, never by the candidate union
      .withColumn(
        "rank",
        row_number()
          .over(Window.orderBy(col("rrf_micro").desc, col("__id").asc)))
      .select(col("__id").as(idCol), col("n_lists"), col("rrf_micro"),
        col("rank"))
  }
}
