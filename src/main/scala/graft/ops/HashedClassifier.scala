package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Hashing-trick linear text classifier INFERENCE — the fastText-style
  * quality/domain classifier pass (Joulin et al. 2016; the CCNet and
  * LLaMA "reference-like page" filters) applied corpus-wide: each token
  * hashes into one of `buckets` feature slots, the document score is the
  * sum of the slots' learned weights plus a bias, and the decision is a
  * threshold on that score. Training happens offline (any framework); at
  * 100 TB the pipeline's job is applying a FROZEN weight vector to every
  * document cheaply — exactly this operator.
  *
  * Weights are INTEGER-scaled (micro-units): the per-document score is a
  * sum of longs, so it is independent of partitioning/merge order (float
  * weight sums are not), engine-portable, and hash-gateable. The sigmoid
  * is deliberately NOT applied — it is monotone, so thresholding the raw
  * integer logit is the same decision without a libm call that would
  * diverge in final ulps across engines; callers wanting probabilities
  * can map `score_micro` through any calibration downstream.
  *
  * Scale posture (100 TB): the weight vector is `buckets` rows — fixed
  * model size, BROADCAST — so scoring is map-side: explode tokens,
  * hash-join the broadcast weights, one partial-agg'd shuffle on doc id
  * (integer sums combine map-side). No per-row driver work, no UDF — the
  * hash is the codegen'd [[TextFunctions.hash61]] and everything else is
  * built-in expressions inside whole-stage codegen.
  */
object HashedClassifier {

  /** Feature slot of a token: `pmod(hash61(token), buckets)`. */
  def bucket(token: Column, buckets: Int): Column =
    pmod(TextFunctions.hash61(token), lit(buckets.toLong)).cast(LongType)

  /** Score every document: tokens ([[TextFunctions.words]]) → hashed
    * slots → broadcast weight join → integer sum. Tokens hashing to a
    * slot absent from `weights` contribute 0 (an L1-pruned model ships
    * only its non-zero slots). Output: (`idCol`, `n_tokens`,
    * `score_micro` = bias + Σ weights, `keep` = score_micro ≥
    * thresholdMicro). Empty/whitespace-only docs score bias alone with
    * `n_tokens` 0.
    *
    * `weights`: (`bucket` LONG in [0, buckets), `weight_micro` LONG) —
    * one row per non-zero model slot.
    */
  def scoreDocs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      weights: DataFrame,
      buckets: Int,
      biasMicro: Long = 0L,
      thresholdMicro: Long = 0L): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1 (got $buckets)")
    val toks = Par.fan(docs).select(
      col(idCol).as("__id"),
      // filter('' ) : split of an empty/trimmed string yields [""] — not a
      // token, and the oracle's regexp_split does the same, so drop it
      // identically on both sides
      filter(TextFunctions.words(col(textCol)), t => t =!= lit(""))
        .as("__w"))
    val slots = toks.select(
      col("__id"),
      explode_outer(col("__w")).as("__t"))
    val w = broadcast(
      weights.select(
        col("bucket").cast(LongType).as("__b"),
        col("weight_micro").cast(LongType).as("__wm")))
    slots
      .join(w, bucket(col("__t"), buckets) === col("__b"), "left")
      .groupBy(col("__id"))
      .agg(
        count(col("__t")).as("n_tokens"),
        (coalesce(sum(col("__wm")), lit(0L)) + lit(biasMicro))
          .as("score_micro"))
      .withColumn("keep", col("score_micro") >= lit(thresholdMicro))
      .select(col("__id").as(idCol), col("n_tokens"), col("score_micro"),
        col("keep"))
  }

  /** A deterministic pseudo-weight table for gates/benchmarks: slot b of
    * `buckets` gets `(hash61('w' || b) pmod (2·amp + 1)) − amp` micro
    * units — replayable bit-exactly in any engine with md5. NOT a trained
    * model; a stand-in with a realistic mixed-sign weight distribution.
    */
  def pseudoWeights(
      spark: org.apache.spark.sql.SparkSession,
      buckets: Int,
      amp: Long = 1000000L): DataFrame =
    spark.range(buckets.toLong).select(
      col("id").as("bucket"),
      (pmod(TextFunctions.hash61(concat(lit("w"), col("id"))),
        lit(2L * amp + 1L)) - lit(amp)).as("weight_micro"))
}
