package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BM25-style keyword retrieval over a document corpus — the scoring pass
  * behind benchmark-decontamination-by-retrieval, eval-set mining and
  * "find documents about X" curation queries.
  *
  * Scoring follows Okapi BM25's tf saturation + length normalization
  * (Robertson & Zaragoza 2009: `tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))`)
  * with the log idf replaced by the integer-scaled rational idf of
  * [[TfIdf]] (`((D+1)·10^6) div (df+1)` — exact integer): no libm call
  * means scores are built from exact integers by IDENTICAL expression
  * trees cross-engine, so the driver gate hash-matches RAW doubles (the
  * [[TfIdf]] precedent; a `ln`-based idf differs in final ulps between
  * engines and would force lossy rounding). Rare-term weighting and tf
  * saturation — BM25's defining behaviors — are preserved; the absolute
  * scale differs from textbook BM25 (documented, monotone-equivalent per
  * term).
  *
  * Per-document score = sum of per-term scores folded in TERM ORDER
  * (sorted fold, not a float `sum()`): double addition is not
  * associative, so a shuffle-order-dependent sum would not be
  * reproducible — the sorted fold is deterministic on any partitioning
  * and replayed exactly by the oracle's ordered `list_reduce`.
  *
  * Scale posture (100 TB): the literal query-term filter sits on the
  * exploded token stream BEFORE any aggregation (Catalyst pushes it into
  * the scan projection), so the only shuffled relation is (doc, term∈Q)
  * tf pairs — bounded by matching docs × |query|, not corpus tokens; df
  * is a |query|-row aggregate of that table joined back broadcast;
  * corpus stats (D docs, T tokens) are a one-row broadcast; the final
  * top-k is TakeOrdered (no global sort) with ranks assigned over the k
  * surviving rows only.
  */
object Bm25 {

  /** Top-`k` documents for `query`, scored per the object scaladoc.
    * Output: (`idCol`, `n_hits`, `score`, `rank`) — `n_hits` = number of
    * distinct query terms present, rank 1 = best, ties broken by id.
    * Terms match [[TextFunctions.words]] tokens exactly (case-sensitive;
    * lowercase the text upstream for case-folded retrieval).
    */
  def searchTopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      query: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "query must contain at least one term")
    require(k >= 1, s"k must be >= 1 (got $k)")
    val terms = query.distinct

    val base = Par.fan(docs).select(
      col(idCol).as("__id"),
      TextFunctions.words(col(textCol)).as("__w"))
    val withDl = base.select(
      col("__id"),
      size(col("__w")).cast(LongType).as("__dl"),
      col("__w"))
    val stats = withDl.agg(
      count(lit(1)).as("__d"),
      sum(col("__dl")).as("__t"))

    // cached: read by the df pass AND as the scored stream side — without
    // it the corpus scan + explode runs twice (observed in the plan audit)
    val tf = Par.cached(
      withDl
        .select(col("__id"), col("__dl"), explode(col("__w")).as("__term"))
        .filter(col("__term").isin(terms: _*))
        .groupBy(col("__id"), col("__dl"), col("__term"))
        .agg(count(lit(1)).as("__tf")))
    val dfreq = tf.groupBy(col("__term")).agg(count(lit(1)).as("__df"))

    val scored = tf
      .join(broadcast(dfreq), "__term")
      .crossJoin(broadcast(stats))
      .withColumn("__idf", expr("((__d + 1) * 1000000) div (__df + 1)"))
      .withColumn(
        "__s",
        col("__idf").cast(DoubleType) *
          (col("__tf") * (lit(k1) + lit(1.0))) /
          (col("__tf") + lit(k1) * (lit(1.0) - lit(b)) +
            lit(k1) * lit(b) *
            (col("__dl").cast(DoubleType) /
              (col("__t").cast(DoubleType) / col("__d").cast(DoubleType)))))

    val agg = scored
      .groupBy(col("__id"))
      .agg(
        count(lit(1)).as("n_hits"),
        aggregate(
          array_sort(
            collect_list(struct(col("__term").as("t"), col("__s").as("s")))),
          lit(0.0),
          (acc, x) => acc + x.getField("s")).as("score"))

    agg
      .orderBy(col("score").desc, col("__id").asc)
      .limit(k)
      // k rows survive the TakeOrdered — the unpartitioned rank window is
      // bounded by k, never by the corpus
      .withColumn(
        "rank",
        row_number()
          .over(Window.orderBy(col("score").desc, col("__id").asc)))
      .select(col("__id").as(idCol), col("n_hits"), col("score"), col("rank"))
  }
}
