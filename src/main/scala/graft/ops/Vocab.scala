package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus vocabulary construction and collocation mining — the tokenizer-
  * design side of a training-data pipeline: before training a BPE/unigram
  * tokenizer you need the corpus's frequency-ranked vocabulary with
  * coverage accounting (what OOV rate does a V-word vocab buy?), and
  * phrase/collocation extraction (PMI) to decide merge candidates and
  * spot boilerplate n-grams.
  *
  * Everything is exact integer arithmetic over counts — deterministic,
  * engine-replayable, hash-gateable. Scale posture (100 TB): counts are
  * map-side partial aggregations (one shuffle of (token, count) rows —
  * vocab-sized, not corpus-sized); top-V selection is Spark's distributed
  * `TakeOrderedAndProject` (never a single-partition global sort of the
  * full vocabulary); the only single-partition step is the running
  * coverage sum over the ALREADY-TRUNCATED V rows (V ≤ a few hundred
  * thousand — driver-bounded by construction).
  */
object Vocab {

  /** Frequency-ranked vocabulary with cumulative coverage.
    *
    * Output: (token, count, rank, cum_count) — rank 1-based by
    * (count desc, token asc); `cum_count` = Σ count over ranks ≤ rank, so
    * `cum_count / total_tokens` is the coverage a rank-sized vocab buys.
    * Tokens below `minCount` are dropped BEFORE ranking (the standard
    * hapax cut); `topV` bounds the output.
    */
  def vocabulary(
      docs: DataFrame,
      textCol: String,
      minCount: Long = 1L,
      topV: Int = 1000): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    require(topV >= 1, "topV must be >= 1")
    val counts = Par.fan(docs)
      .select(explode(TextFunctions.words(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("count"))
      .filter(col("count") >= minCount)
    // distributed top-V (TakeOrderedAndProject), THEN the tiny ranked
    // window over V rows — the full vocab never passes through one task
    val top = counts
      .orderBy(col("count").desc, col("token").asc)
      .limit(topV)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("count").desc, col("token").asc)
    top
      .select(
        col("token"),
        col("count"),
        row_number().over(w).as("rank"),
        sum(col("count")).over(w).as("cum_count"))
  }

  /** PMI-ranked bigram collocations, exact-integer scored.
    *
    * PMI(x,y) = log p(xy)/(p(x)p(y)) is monotone in the RATIO
    * `c_xy · N / (c_x · c_y)` (N = total tokens), so ranking by the ratio
    * ranks by PMI without ever computing a float log: the score is
    * `ratio_ppm = ⌊c_xy · N · 10⁶ / (c_x · c_y)⌋` in exact DECIMAL(38,0)
    * arithmetic (c_xy·N·10⁶ overflows a 64-bit long at web scale — a
    * trillion-token corpus squared is 10²⁴).
    *
    * Output: (w1, w2, c_xy, c_x, c_y, ratio_ppm, rank) for the `topP`
    * bigrams with `c_xy ≥ minCount`, ranked by (ratio_ppm desc, w1, w2).
    *
    * One corpus scan feeds both count shuffles (unigram + bigram, each
    * vocab-sized partial aggs); the scoring joins are on the token key
    * against the one-row-per-token unigram table.
    */
  def pmiBigrams(
      docs: DataFrame,
      textCol: String,
      minCount: Long = 5L,
      topP: Int = 100): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    require(topP >= 1, "topP must be >= 1")
    val ws = Par.cached(
      Par.fan(docs).select(TextFunctions.words(col(textCol)).as("ws")))
    val uni = ws
      .select(explode(col("ws")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("c"))
    val total = ws
      .select(sum(size(col("ws"))).as("n"))
      .collect()(0).getLong(0) // one driver scalar, like PageRank's N
    val bi = ws
      .select(explode(TextFunctions.shingles(col("ws"), 2)).as("bg"))
      .groupBy(col("bg"))
      .agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
      .select(
        split_part(col("bg"), lit(" "), lit(1)).as("w1"),
        split_part(col("bg"), lit(" "), lit(2)).as("w2"),
        col("c_xy"))
    val dec = DecimalType(38, 0)
    // exact integral division (`div`), NOT decimal `/`+floor: Spark's
    // decimal division rounds HALF_UP at the result scale BEFORE any
    // floor, so a quotient just below an integer can round across it
    def intDiv(a: Column, b: Column): Column =
      org.apache.spark.sql.graft.ColumnShim.column(
        org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          org.apache.spark.sql.graft.ColumnShim.expression(a),
          org.apache.spark.sql.graft.ColumnShim.expression(b)))
    val scored = bi
      .join(uni.select(col("token").as("w1"), col("c").as("c_x")), "w1")
      .join(uni.select(col("token").as("w2"), col("c").as("c_y")), "w2")
      .select(
        col("w1"), col("w2"), col("c_xy"), col("c_x"), col("c_y"),
        intDiv(
          col("c_xy").cast(dec) * lit(total).cast(dec) * lit(1000000L).cast(dec),
          col("c_x").cast(dec) * col("c_y").cast(dec))
          .cast(LongType).as("ratio_ppm"))
    val top = scored
      .orderBy(col("ratio_ppm").desc, col("w1").asc, col("w2").asc)
      .limit(topP)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("ratio_ppm").desc, col("w1").asc, col("w2").asc)
    top.withColumn("rank", row_number().over(w))
  }

  /** Per-group out-of-vocabulary report: what fraction of each group's
    * tokens falls outside the corpus's top-`topV` vocabulary — the
    * accounting that decides a tokenizer's vocab size and flags languages
    * a shared vocab underserves (high OOV ⇒ byte-fallback blowup, worse
    * fertility).
    *
    * Two corpus scans by design (the vocab must exist before scoring);
    * the vocab itself is `topV` rows — BROADCAST into a map-side
    * membership join, so the scoring pass shuffles only the per-group
    * count rows. Exact integers: (groupCol, total_tokens, in_vocab,
    * oov_tokens, oov_ppm = ⌊oov·10⁶/total⌋).
    */
  def oovReport(
      docs: DataFrame,
      textCol: String,
      groupCol: String,
      minCount: Long = 1L,
      topV: Int = 1000): DataFrame = {
    val vocab = vocabulary(docs, textCol, minCount, topV)
      .select(col("token"), lit(1L).as("__in"))
    val toks = Par.fan(docs)
      .select(col(groupCol), explode(TextFunctions.words(col(textCol))).as("token"))
    toks
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("total_tokens"),
        sum(coalesce(col("__in"), lit(0L))).as("in_vocab"))
      .select(
        col(groupCol),
        col("total_tokens"),
        col("in_vocab"),
        (col("total_tokens") - col("in_vocab")).as("oov_tokens"),
        org.apache.spark.sql.graft.ColumnShim.column(
          org.apache.spark.sql.catalyst.expressions.IntegralDivide(
            org.apache.spark.sql.graft.ColumnShim.expression(
              (col("total_tokens") - col("in_vocab")) * lit(1000000L)),
            org.apache.spark.sql.graft.ColumnShim.expression(
              col("total_tokens"))))
          .as("oov_ppm"))
  }
}
