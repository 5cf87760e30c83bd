package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: a real trained-merges BPE (not the char/4
  * estimate in [[TextFunctions.bpeTokenEstimate]]).
  *
  * Training is the standard sample-based shape every production BPE trainer
  * uses: the corpus collapses to a word-frequency histogram (one distributed
  * shuffle with map-side combine — at 100 TB the histogram, not the corpus,
  * is what fits in memory), the top `topWords` rows by mass are collected,
  * and merge rules are learned greedily on the weighted histogram. Ties
  * break lexicographically so training is deterministic for a fixed corpus.
  *
  * Encoding applies the learned ranks per word (greedy lowest-rank merge
  * first — the canonical BPE encode loop). The merge loop is inherently
  * procedural, so it runs as a serialized-closure UDF over the words array;
  * everything around it (splitting, exploding, counting) stays in Catalyst.
  */
object Bpe {

  /** Learned merge rules: (left, right) -> rank (lower merges first). */
  final case class Merges(ranks: Map[(String, String), Int]) extends Serializable {
    def vocabSize: Int = ranks.size
  }

  /** Learn `numMerges` merge rules from the corpus text column. */
  def train(
      corpus: DataFrame,
      textCol: String,
      numMerges: Int,
      topWords: Int = 50000): Merges = {
    val hist: Array[(String, Long)] = corpus
      .select(explode(TextFunctions.words(lower(col(textCol)))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(topWords)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))

    // words as symbol sequences; learn merges on the weighted histogram
    var seqs: Array[(Array[String], Long)] =
      hist.map { case (w, n) => (codepointSyms(w), n) }
    val ranks = scala.collection.mutable.LinkedHashMap.empty[(String, String), Int]
    var merge = 0
    var exhausted = false
    while (merge < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      seqs.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val best = pairCounts.toSeq
          .minBy { case ((a, b), n) => (-n, a, b) }
          ._1
        ranks.update(best, merge)
        seqs = seqs.map { case (syms, n) => (applyMerge(syms, best), n) }
        merge += 1
      }
    }
    Merges(ranks.toMap)
  }

  /** Initial symbol sequence of a word: one symbol per Unicode CODEPOINT
    * (`word.map(_.toString)` would split surrogate pairs, giving 2 symbols
    * per non-BMP char where the DuckDB oracle's `string_split(w, '')` gives
    * 1 — token counts would diverge on emoji etc.).
    */
  private def codepointSyms(word: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      out += word.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  private def applyMerge(
      syms: Array[String],
      pair: (String, String)): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** The frozen production merge table: `train(documents@sf0.01, numMerges
    * = 100, topWords = 5000)`, exhausted after 89 merges (the synthetic
    * vocabulary fully merges). Training is deterministic, so this constant
    * is reproducible from the corpus — BpeSpec pins that provenance. The
    * gated query encodes with this table (train once, encode everywhere —
    * the production shape), and the DuckDB oracle replays the same table,
    * generated from this constant so the two sides cannot drift.
    */
  val Frozen: Seq[(String, String)] = Seq(
    ("e", "r"), ("i", "n"), ("o", "w"),
    ("o", "r"), ("s", "t"), ("m", "er"),
    ("a", "t"), ("l", "u"), ("a", "r"),
    ("p", "ar"), ("j", "o"), ("jo", "in"),
    ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"),
    ("b", "atch"), ("a", "n"), ("c", "an"),
    ("s", "can"), ("c", "o"), ("c", "u"),
    ("co", "lu"), ("colu", "m"), ("colum", "n"),
    ("cu", "st"), ("cust", "o"), ("custo", "mer"),
    ("f", "i"), ("fi", "l"), ("fil", "t"),
    ("filt", "er"), ("a", "l"), ("al", "l"),
    ("m", "all"), ("s", "mall"), ("g", "e"),
    ("l", "ow"), ("mer", "ge"), ("s", "low"),
    ("c", "t"), ("ct", "or"), ("d", "er"),
    ("e", "ctor"), ("or", "der"), ("v", "ector"),
    ("in", "e"), ("l", "ine"), ("a", "b"),
    ("ab", "l"), ("abl", "e"), ("at", "a"),
    ("d", "ata"), ("t", "able"), ("u", "p"),
    ("a", "g"), ("ag", "g"), ("a", "lu"),
    ("alu", "e"), ("v", "alue"), ("e", "y"),
    ("k", "ey"), ("a", "m"), ("e", "am"),
    ("r", "eam"), ("st", "ream"), ("d", "ow"),
    ("in", "dow"), ("w", "indow"), ("par", "k"),
    ("s", "park"), ("g", "r"), ("gr", "o"),
    ("gro", "up"), ("par", "t"), ("b", "i"),
    ("bi", "g"), ("or", "t"), ("s", "ort"),
    ("er", "y"), ("q", "u"), ("qu", "ery"),
    ("a", "st"), ("f", "ast"), ("h", "e"),
    ("t", "he"), ("d", "up"))

  def frozenMerges: Merges = Merges(Frozen.zipWithIndex.toMap)

  /** Ordered-sweep BPE encode: apply each merge rule in rank order,
    * exhaustively left-to-right. (Note this is NOT subword-nmt's
    * `apply_bpe`, which is the iterative greedy lowest-rank loop — that is
    * [[encodeWord]].) A merge's pair consists of symbols created strictly
    * before its own rank, so the sweep and the greedy loop agree except
    * when two different merge paths produce the same symbol string —
    * BpeSpec asserts they agree on every trained word for the frozen
    * table; out-of-vocabulary words at other scale factors may encode
    * non-canonically, but engine and oracle stay consistent with each
    * other. This is the formulation the DuckDB oracle replays (a
    * boundary-delimited string-replace chain is exactly an ordered sweep).
    */
  def encodeWordOrdered(word: String, merges: Seq[(String, String)]): Array[String] = {
    var syms = codepointSyms(word)
    var i = 0
    while (i < merges.length && syms.length > 1) {
      syms = applyMerge(syms, merges(i))
      i += 1
    }
    syms
  }

  /** Word array for BPE: whitespace-split, additionally splitting on u+001e
    * (the oracle replace-chain's delimiter, which is NOT regex whitespace) —
    * a pathological text containing it would otherwise inflate the oracle's
    * delimiter-count token formula. The oracle splits identically.
    */
  private[graft] def bpeWords(text: Column): Column =
    split(trim(lower(text)), "[\\s\\x1e]+")

  /** Column of ordered-sweep BPE tokens for a frozen merge table (per-task
    * memoized like [[tokens]]).
    */
  def tokensOrdered(text: Column, merges: Seq[(String, String)]): Column = {
    val cache = new scala.collection.mutable.HashMap[String, Array[String]]
    val enc = udf { (ws: Seq[String]) =>
      if (ws == null) Seq.empty[String]
      else ws.filter(_.nonEmpty).flatMap(w =>
        cache.getOrElseUpdate(w, encodeWordOrdered(w, merges)))
    }
    enc(bpeWords(text))
  }

  /** Ordered-sweep BPE token count for a frozen merge table. */
  def tokenCountOrdered(text: Column, merges: Seq[(String, String)]): Column =
    size(tokensOrdered(text, merges))

  /** Canonical BPE encode of one word: repeatedly merge the lowest-rank
    * adjacent pair until no learned pair remains.
    */
  def encodeWord(word: String, merges: Merges): Array[String] = {
    var syms = codepointSyms(word)
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val r = merges.ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (bestPair == null) done = true
      else {
        syms = applyMerge(syms, bestPair)
        done = syms.length < 2
      }
    }
    syms
  }

  /** Column of BPE tokens (array of subword strings) for a text column.
    * Per-word encodings are memoized per task (the closure's cache lives for
    * the task's row stream) — natural-language word frequency is Zipfian, so
    * most words hit the cache.
    */
  def tokens(text: Column, merges: Merges): Column = {
    val cache = new scala.collection.mutable.HashMap[String, Array[String]]
    val enc = udf { (ws: Seq[String]) =>
      if (ws == null) Seq.empty[String]
      else ws.filter(_.nonEmpty).flatMap(w =>
        cache.getOrElseUpdate(w, encodeWord(w, merges)))
    }
    enc(bpeWords(text))
  }

  /** Column of BPE token count for a text column. */
  def tokenCount(text: Column, merges: Merges): Column =
    size(tokens(text, merges))
}
