package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-trained TF-IDF term weighting — keyword extraction and document
  * distinctiveness scoring for LLM-data curation (a doc whose every term is
  * corpus-common is boilerplate; per-doc top-idf terms are cheap topic
  * labels for mixture balancing).
  *
  * Training IS the query, as in [[NgramLm]]: the per-(doc, term) frequency
  * table is ONE shuffle over the exploded token stream, and document
  * frequency is a partial-agg second pass over that already-collapsed table
  * (one row per (doc, term) — counting rows per term IS counting documents
  * per term). The idf table never materializes on the driver, so vocabulary
  * size is unbounded; the corpus-size scalar N is a one-row broadcast.
  *
  * Determinism (oracle-portability): idf is the integer-scaled rational
  * FLOOR((n_docs * scale) / df) — no logarithm, so no libm variance across
  * engines — and per-term weights tf * idf are exact longs. [[scoreDocs]]
  * performs its single IEEE double division at the very end;
  * [[topKeywords]] is pure integer comparison with a lexicographic
  * tie-break. Bound: weights stay in int64 while
  * scale * n_docs * max_tf < 2^63 — at scale = 1e6 that allows billions of
  * documents with per-doc term counts in the thousands.
  *
  * Skew posture: term frequency is power-law ("the" appears in nearly every
  * document), so joining the tf table against idf on the raw term would
  * send a hot term's (doc, term) rows — one per containing document, i.e.
  * up to N rows — to one shuffle partition. [[SkewJoin.hotTailEquiJoin]]
  * broadcasts the `hotK` highest-df terms' idf values and joins them
  * map-side; only the tail takes the shuffled join.
  */
object TfIdf {

  /** Per-(document, term) TF-IDF weights: (doc_id, term, tf, weight) where
    * weight = tf * FLOOR((n_docs * scale) / df). One row per distinct term
    * occurrence pair; documents contribute their whitespace tokens as-is
    * (no case folding — compose with `lower()` upstream if wanted).
    */
  def termWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      scale: Long = 1000000L,
      hotK: Int = 1024): DataFrame = {
    val tok = Par.fan(df).select(
      col(idCol).as("doc_id"),
      explode(TextFunctions.words(col(textCol))).as("term"))
    // cached: read by the df pass and as the join stream side
    val tf = Par.cached(
      tok.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf")))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("n_docs"))
    val idf = dfreq
      .crossJoin(broadcast(n))
      .select(
        col("term"),
        col("df"),
        expr(s"(n_docs * ${scale}L) div df").as("idf"))
    SkewJoin.hotTailEquiJoin(
        tf, idf, "term",
        Seq(col("df").desc, col("term")), hotK, rankCols = Seq("df"))
      .select(
        col("doc_id"),
        col("term"),
        col("tf"),
        (col("tf") * col("idf")).as("weight"))
  }

  /** Per-document distinctiveness score: (doc_id, n_terms, n_tokens,
    * tfidf) where tfidf = SUM(tf * idf_scaled) / n_tokens — exact integer
    * sums, one final double division. High = rare-term-heavy (topical);
    * low = stopword/boilerplate-heavy.
    */
  def scoreDocs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      scale: Long = 1000000L,
      hotK: Int = 1024): DataFrame =
    termWeights(df, idCol, textCol, scale, hotK)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_terms"),
        sum(col("tf")).as("n_tokens"),
        sum(col("weight")).as("sum_weight"))
      .select(
        col("doc_id"),
        col("n_terms"),
        col("n_tokens"),
        (col("sum_weight").cast(DoubleType) /
          col("n_tokens").cast(DoubleType)).as("tfidf"))

  /** Top-`k` keywords per document by TF-IDF weight (ties broken on the
    * term itself — fully deterministic): (doc_id, term, weight, rank).
    * The window partitions by document, so no single-task global sort.
    */
  def topKeywords(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      scale: Long = 1000000L,
      hotK: Int = 1024): DataFrame = {
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("weight").desc, col("term"))
    termWeights(df, idCol, textCol, scale, hotK)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("weight"), col("rank"))
  }

  /** Positional posting lists — the materialized inverted-index artifact
    * behind keyword retrieval ([[Bm25.searchTopK]] builds its tf relation
    * on the fly; this EMITS the index for reuse): one row per distinct
    * (term, document) pair with the within-doc term frequency, the
    * 1-based position of the FIRST occurrence (phrase/proximity seeds),
    * and the term's document frequency — everything a downstream search
    * or decontamination pass joins against.
    *
    * Scale posture: one explode exchange into the (term, doc) partial
    * agg (min-position and count combine map-side); df is a second
    * partial agg over the already-collapsed postings; the df join back
    * rides [[SkewJoin.hotTailEquiJoin]] — a stopword-class term owns up
    * to one posting per document, so the hottest `hotK` terms' df values
    * broadcast and join map-side while only the tail shuffles (the P19/
    * P32 convention).
    *
    * Output: (`term`, `doc_id`, `tf`, `first_pos`, `df`).
    */
  def postings(
      df: DataFrame,
      idCol: String,
      textCol: String,
      hotK: Int = 1024): DataFrame = {
    val occ = Par.fan(df).select(
      col(idCol).as("doc_id"),
      posexplode(TextFunctions.words(col(textCol)))
        .as(Seq("__pos0", "term")))
    val post = Par.cached(
      occ
        .groupBy(col("term"), col("doc_id"))
        .agg(
          count(lit(1)).as("tf"),
          (min(col("__pos0")) + 1).cast("long").as("first_pos")))
    val dfreq = post
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    SkewJoin
      .hotTailEquiJoin(post, dfreq, "term", Seq(col("df").desc, col("term")), hotK)
      .select(
        col("term"), col("doc_id"), col("tf"), col("first_pos"), col("df"))
  }

  /** Exact PHRASE search — documents containing `phrase` as consecutive
    * words, with the match count and the 1-based position of the first
    * match: the positional-index query ([[postings]] is the artifact,
    * this is the classic consumer) behind quoted-query retrieval,
    * benchmark-prompt decontamination ("drop docs containing this exact
    * question"), and n-gram provenance lookups.
    *
    * Scale posture: the occurrence stream filters to the phrase's words
    * MAP-SIDE before anything shuffles (a k-word phrase keeps only its
    * k terms' postings), then k−1 equi-joins on (doc, adjacent position)
    * — each join key is (doc_id, pos), so volume is bounded by the
    * phrase terms' occurrence counts, never the corpus. A stopword-only
    * phrase degrades toward the full stream; prefer phrases with at
    * least one rare word (the standard positional-index advice).
    */
  def phraseMatches(
      df: DataFrame,
      idCol: String,
      textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one word")
    val occ = Par.cached(
      Par.fan(df)
        .select(
          col(idCol).as("doc_id"),
          posexplode(TextFunctions.words(col(textCol)))
            .as(Seq("__pos0", "__term")))
        .filter(col("__term").isin(phrase: _*))
        .select(
          col("doc_id"),
          (col("__pos0") + 1).cast("long").as("__pos"),
          col("__term")))
    val first = occ
      .filter(col("__term") === phrase.head)
      .select(col("doc_id"), col("__pos").as("start_pos"))
    val matches = phrase.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (w, i)) =>
        acc.join(
          occ
            .filter(col("__term") === w)
            .select(col("doc_id"), (col("__pos") - i).as("start_pos")),
          Seq("doc_id", "start_pos"))
    }
    matches
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_matches"),
        min(col("start_pos")).as("first_pos"))
  }
}
