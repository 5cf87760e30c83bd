package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-trained bigram language-model fluency scoring — the n-gram analog
  * of the quality signals an LLM-data pipeline gates documents on (a doc
  * whose word transitions are all corpus-rare is boilerplate, garbled
  * extraction, or another language).
  *
  * Training IS the query: two corpus histograms (bigram counts, prefix
  * counts), each one partial-agg shuffle over the exploded bigram stream;
  * the model never materializes on the driver and nothing broadcasts, so
  * vocabulary size is unbounded. Scoring joins the doc's bigrams back
  * against the probability table — shuffles are bounded by corpus token
  * count (the explode), the classic distributed-LM-scoring shape.
  *
  * Determinism (oracle-portability) is engineered in: each bigram's
  * conditional probability is integer-scaled FLOOR((c2 * scale) / c1) — a
  * pure integer computation identical in any engine — and summed as exact
  * longs; only the final per-doc average performs one IEEE double division.
  * Summing raw double ratios would be summation-order-dependent and could
  * never hash-match a second engine.
  */
object NgramLm {

  /** Score each document by the average integer-scaled conditional
    * probability of its word bigrams under the corpus's own bigram model:
    * avg over bigrams (w1 w2) of FLOOR(scale * c(w1 w2) / c(w1-prefix)).
    *
    * Output: (doc_id, n_bigrams, fluency) — documents with fewer than two
    * words carry no bigrams and emit no row. `fluency` is in [0, scale]:
    * scale means every transition is deterministic given its prefix.
    *
    * Skew posture: natural-language bigram frequency is power-law ("of
    * the" can be percents of the whole stream), so joining the exploded
    * stream against the probability table on the raw bigram would send a
    * hot bigram's entire occurrence mass to one shuffle partition. The
    * `hotK` most frequent bigrams' probabilities (a bounded top-K — K rows
    * on the driver, never the model) are therefore BROADCAST and joined
    * map-side; only the tail — whose per-key count is by construction
    * ≤ the K-th hottest count — takes the shuffled join. Result-identical
    * to the single-join plan; `hotK = 0` disables the split.
    */
  def bigramFluency(
      df: DataFrame,
      idCol: String,
      textCol: String,
      scale: Long = 1000000L,
      hotK: Int = 1024): DataFrame = {
    // one explode feeds training and scoring (cached: read three times)
    val bigrams = Par.cached(
      Par.fan(df).select(
        col(idCol).as("doc_id"),
        explode(
          TextFunctions.shingles(TextFunctions.words(col(textCol)), 2))
          .as("bigram")))
    val w1 = substring_index(col("bigram"), " ", 1)
    val bigramCounts = bigrams
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("c2"))
    val prefixCounts = bigrams
      .groupBy(w1.as("w1"))
      .agg(count(lit(1)).as("c1"))
    val probs = bigramCounts
      .withColumn("w1", w1)
      .join(prefixCounts, "w1")
      .select(
        col("bigram"),
        col("c2"),
        expr(s"(c2 * ${scale}L) div c1").as("micro"))

    // hot/tail split on the K most frequent bigrams (ties broken on the
    // bigram itself so the split is deterministic)
    val scored = SkewJoin.hotTailEquiJoin(
      bigrams, probs, "bigram",
      Seq(col("c2").desc, col("bigram")), hotK, rankCols = Seq("c2"))

    scored
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("micro")).as("sum_micro"))
      .select(
        col("doc_id"),
        col("n_bigrams"),
        (col("sum_micro").cast(DoubleType) /
          col("n_bigrams").cast(DoubleType)).as("fluency"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3): within
    * each language, rank documents by model fluency and split the ranking
    * into `nBuckets` equal slices — bucket 0 ("head") = the most fluent
    * third, then "middle", then "tail". CCNet keeps head+middle for
    * pretraining and drops (or down-weights) the tail; emitting the
    * bucket as a column leaves that policy to the caller.
    *
    * The slice assignment is EXACT INTEGER math on the within-language
    * rank: `bucket = ((rank − 1) · nBuckets) div n_lang` with rank by
    * (fluency desc, id asc) — no float quantile cutoffs, so the
    * assignment is deterministic, engine-portable and hash-gateable.
    * Documents with fewer than two words carry no bigrams, hence no
    * fluency, hence no row (the CCNet filter also drops them).
    *
    * Scale posture: fluency is [[bigramFluency]] (its skew story applies);
    * the ranking is ONE shuffle on the language key with a group window —
    * languages parallelize across tasks, and a single pathologically hot
    * language serializes only its own window chain (the [[Sampling
    * .groupQuantiles]] trade-off; slice a one-language corpus through a
    * range-bucketed rank instead). Output: (`idCol`, lang, n_bigrams,
    * fluency, bucket, bucket_name).
    */
  def perplexityBuckets(
      df: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      nBuckets: Int = 3,
      scale: Long = 1000000L,
      hotK: Int = 1024): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1 (got $nBuckets)")
    val fl = bigramFluency(df, idCol, textCol, scale, hotK)
      .withColumnRenamed("doc_id", "__pb_id")
    val langs = df.select(col(idCol).as("__pb_id"), col(langCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(langCol))
    val rankW = w.orderBy(col("fluency").desc, col("__pb_id").asc)
    val names = Seq("head", "middle", "tail")
    fl.join(langs, "__pb_id")
      .withColumn("__pb_rank", row_number().over(rankW))
      .withColumn("__pb_n", count(lit(1)).over(w))
      .withColumn(
        "bucket",
        expr(s"((__pb_rank - 1) * $nBuckets) div __pb_n").cast(IntegerType))
      .withColumn(
        "bucket_name",
        if (nBuckets == 3)
          element_at(array(names.map(lit(_)): _*), col("bucket") + 1)
        else concat(lit("b"), col("bucket")))
      .select(col("__pb_id").as(idCol), col(langCol), col("n_bigrams"),
        col("fluency"), col("bucket"), col("bucket_name"))
  }
}
