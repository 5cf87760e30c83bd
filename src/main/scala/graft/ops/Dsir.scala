package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"): score
  * every raw-corpus document by how much its hashed-bigram distribution
  * resembles a small TARGET corpus (a benchmark, a high-quality seed set),
  * then keep the top-scoring slice — the standard "make the web corpus look
  * like Wikipedia" curation move.
  *
  * Model: both corpora are bucketed bag-of-hashed-bigram distributions
  * (`buckets` cells, the paper's hashed n-gram features). Each bucket gets
  * an importance weight from the add-one-smoothed target/raw count ratio,
  * and a document's score is the sum of its gram occurrences' weights.
  *
  * Determinism (oracle portability): the paper's per-gram weight is
  * log(p_target/p_raw); a logarithm would hash-differ across engines in the
  * last ulp (the same libm trade P19/P32 refused), so the weight here is
  * the integer-scaled rational FLOOR(((ct+1) · scale) / (cr+1)) — exact
  * long arithmetic, identical in any engine. Two documented deviations,
  * both rank-preserving or benign:
  *   - the global (N_raw+B)/(N_target+B) normalizer is dropped: it
  *     multiplies every bucket weight by the same positive constant, so
  *     per-document ranking — the only thing selection consumes — is
  *     unchanged;
  *   - scores average ratio surrogates rather than summing log-ratios:
  *     smoothed ratios are all positive (log-ratios go negative on
  *     raw-favored grams), so a SUM would reward sheer length; the
  *     per-gram MEAN is length-neutral and weighs strong target-evidence
  *     grams more aggressively than the log would. The spec pins the
  *     selection behavior this buys on a bimodal corpus.
  *
  * Scale posture (100 TB): both histograms partial-agg to ≤ `buckets` rows;
  * the weight table is ≤ `buckets` rows and BROADCASTS, so scoring is one
  * map-side join over the exploded gram stream plus one partial-agg'd
  * per-doc sum — no skew surface (hot buckets ride the broadcast), no
  * corpus-sized intermediate cached, top-k is TakeOrdered (no global sort).
  * Overflow bound: needs (ct_max+1)·scale < 2^63 — i.e. the TARGET corpus
  * (a benchmark: small by definition) has < 9.2e12 occurrences of one
  * bucket at the default scale; the raw corpus size is unconstrained.
  */
object Dsir {

  /** Non-distinct hashed-bigram bucket stream of `df`: (idCol, bucket).
    * Docs with < 2 words contribute no rows (and thus never score).
    */
  private def gramBuckets(
      df: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int): DataFrame =
    Par.fan(df)
      .select(
        col(idCol),
        explode(TextFunctions.shingles(TextFunctions.words(col(textCol)), 2))
          .as("gram"))
      .select(
        col(idCol),
        (TextFunctions.hash61(col("gram")) % buckets).as("bucket"))

  /** Importance weight per bucket id in [0, buckets): the integer-scaled
    * smoothed target/raw ratio FLOOR(((ct+1) · scale) / (cr+1)). Emits ALL
    * bucket ids (missing counts smooth to ct=0 / cr=0), so the result can
    * score corpora beyond the one that built the raw histogram.
    */
  def bucketWeights(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 8192,
      scale: Long = 1000000L): DataFrame = {
    val spark = raw.sparkSession
    val rawHist = gramBuckets(raw, idCol, textCol, buckets)
      .groupBy(col("bucket")).agg(count(lit(1)).as("cr"))
    val tgtHist = gramBuckets(target, idCol, textCol, buckets)
      .groupBy(col("bucket")).agg(count(lit(1)).as("ct"))
    spark.range(buckets).select(col("id").as("bucket"))
      .join(rawHist, Seq("bucket"), "left")
      .join(tgtHist, Seq("bucket"), "left")
      .select(
        col("bucket"),
        expr(s"((coalesce(ct, 0L) + 1L) * ${scale}L) div " +
          "(coalesce(cr, 0L) + 1L)").as("weight"))
  }

  /** Score each doc of `df` under a weight table from [[bucketWeights]]:
    * (doc_id, n_grams, dsir_score) where dsir_score = MEAN bucket weight
    * over the doc's gram occurrences. The mean (not the sum) keeps the
    * score length-neutral: under a summed ratio surrogate a long noise doc
    * outscores a short target lookalike simply by having more grams
    * (every smoothed weight is positive, unlike the paper's log-ratios,
    * which go negative on raw-favored grams). Exact long sum + ONE double
    * division — deterministic, oracle-portable. Weights broadcast; one
    * shuffle total (the per-doc partial agg).
    */
  def scoreDocs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      weights: DataFrame,
      buckets: Int = 8192): DataFrame =
    gramBuckets(df, idCol, textCol, buckets)
      .join(broadcast(weights), "bucket")
      .groupBy(col(idCol).as("doc_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        (sum(col("weight")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("dsir_score"))

  /** One-call selection: build weights from the raw/target split, score the
    * raw corpus, keep the `k` highest-scoring docs (score desc, id asc
    * tie-break — deterministic). TakeOrdered, never a global sort.
    */
  def selectTopK(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      buckets: Int = 8192,
      scale: Long = 1000000L): DataFrame = {
    val w = bucketWeights(raw, target, idCol, textCol, buckets, scale)
    scoreDocs(raw, idCol, textCol, w, buckets)
      .orderBy(col("dsir_score").desc, col("doc_id"))
      .limit(k)
  }
}
