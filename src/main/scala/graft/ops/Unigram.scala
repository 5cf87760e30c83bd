package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer: the one widely-used
  * tokenizer-design algorithm the family ([[Bpe]] merges, [[Vocab]]
  * frequency ranking, PMI collocations, OOV accounting) lacked. Kudo 2018
  * ("Subword Regularization", ACL) trains a unigram language model over a
  * substring vocabulary by EM and segments with Viterbi; this
  * implementation keeps the same shape while trading float likelihoods for
  * INTEGER-SCALED costs so every pruning decision and every segmentation
  * is engine-replayable (the [[NgramLm]]/[[TfIdf]] rational trade):
  *
  *   - piece cost = round(K · log2(total/count)) — the ONLY float is one
  *     driver-side StrictMath.log per piece per M-step, rounded to an int
  *     before anything downstream consumes it (StrictMath, not Math: the
  *     intrinsic may differ across platforms, the strict one cannot);
  *   - E-step is hard (Viterbi-count) rather than forward-backward: counts
  *     stay exact longs, weighted by the word histogram;
  *   - Viterbi tie-breaks are total: min by (cost, then token count, then
  *     the chr(31)-joined piece path lexicographically) — two engines
  *     cannot disagree on an argmin that is a total order.
  *
  * Training scale posture = [[Bpe.train]]: the corpus collapses to a
  * word-frequency histogram (ONE distributed shuffle with map-side
  * combine — at 100 TB the histogram, not the corpus, is what fits in
  * driver memory), and EM runs driver-side on that bounded model state.
  * Encoding is a per-task-memoized UDF over the split words (the
  * documented BPE-trellis UDF exception class — a Viterbi DP is
  * inherently procedural).
  *
  * Positions are Unicode CODEPOINT positions (like [[Bpe.codepointSyms]]):
  * DuckDB's substr/length count codepoints, so a UTF-16 DP would diverge
  * on non-BMP input.
  */
object Unigram {

  /** Cost scale: cost = round(K · log2(total/count)). */
  val K = 100

  /** Out-of-vocabulary single-character transition cost — higher than any
    * trained cost (max trainable ≈ K·log2(total) ≪ 5000 for any corpus
    * below 2^50 tokens), so the char fallback only wins when no vocab
    * piece covers a character.
    */
  val UnkCost = 5000L

  /** Maximum piece length considered in training and in the Viterbi DP.
    * The DuckDB replay unrolls one CTE stage per word position with
    * min(MaxPieceLen, p) join branches each — bounded SQL.
    */
  val MaxPieceLen = 6

  /** Viterbi path delimiter (shared with the oracle's chr(31)). */
  val PathDelim = "\u001f"

  /** Learn a (piece → integer cost) vocabulary of about `vocabSize`
    * pieces from the corpus text column. Deterministic for a fixed corpus:
    * the histogram is an exact aggregate with a total (count desc, word
    * asc) order, and every EM/pruning decision runs on exact longs with
    * lexicographic tie-breaks. Single characters seen in training are
    * never pruned (char coverage — every word stays encodable), so a
    * corpus whose distinct-character count exceeds `vocabSize` returns
    * MORE than `vocabSize` pieces: char coverage wins over the target.
    */
  def train(
      corpus: DataFrame,
      textCol: String,
      vocabSize: Int,
      topWords: Int = 50000,
      emRounds: Int = 3): Seq[(String, Int)] = {
    val hist: Array[(Array[String], Long)] = corpus
      .select(explode(TextFunctions.words(lower(col(textCol)))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(topWords)
      .collect()
      .map(r => (codepointSyms(r.getString(0)), r.getLong(1)))

    // ---- seed: every substring occurrence up to MaxPieceLen, weighted ----
    val seedCounts = scala.collection.mutable.HashMap.empty[String, Long]
    hist.foreach { case (syms, n) =>
      var i = 0
      while (i < syms.length) {
        var l = 1
        val maxL = math.min(MaxPieceLen, syms.length - i)
        while (l <= maxL) {
          val p = syms.slice(i, i + l).mkString
          seedCounts.update(p, seedCounts.getOrElse(p, 0L) + n)
          l += 1
        }
        i += 1
      }
    }
    val chars: Set[String] =
      seedCounts.keysIterator.filter(cpLen(_) == 1).toSet
    // seed = all single chars + the heaviest multi-char substrings
    val seedMulti = seedCounts.iterator
      .filter { case (p, _) => cpLen(p) > 1 }
      .toSeq
      .sortBy { case (p, n) => (-n, p) }
      .take(math.max(vocabSize * 4, 64))
    var costs: Map[String, Long] = toCosts(
      (chars.iterator.map(c => c -> seedCounts(c)) ++
        seedMulti.iterator).toMap)

    // ---- EM (hard, Viterbi-count), pruning before the final round ----
    var round = 0
    while (round < emRounds) {
      val use = scala.collection.mutable.HashMap.empty[String, Long]
      hist.foreach { case (syms, n) =>
        viterbi(syms, costs).foreach { p =>
          use.update(p, use.getOrElse(p, 0L) + n)
        }
      }
      // char coverage: unused single chars stay with a count floor of 1
      chars.foreach(c => if (!use.contains(c)) use.update(c, 1L))
      val kept: Map[String, Long] =
        if (round == emRounds - 1) use.toMap // already pruned last round
        else {
          val multi = use.iterator
            .filter { case (p, _) => cpLen(p) > 1 }
            .toSeq
            .sortBy { case (p, n) => (-n, p) }
            .take(math.max(vocabSize - chars.size, 0))
          (chars.iterator.map(c => c -> use(c)) ++ multi.iterator).toMap
        }
      costs = toCosts(kept)
      round += 1
    }
    costs.toSeq
      .map { case (p, c) => (p, c.toInt) }
      .sortBy(_._1)
  }

  /** counts → integer costs: round(K · log2(total/count)), floored at 1 so
    * no piece is free.
    */
  private def toCosts(counts: Map[String, Long]): Map[String, Long] = {
    val total = counts.valuesIterator.sum.toDouble
    counts.map { case (p, n) =>
      val c = math.round(
        K * (StrictMath.log(total / n.toDouble) / StrictMath.log(2.0)))
      p -> math.max(1L, c)
    }
  }

  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

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

  /** Viterbi segmentation over codepoint symbols: minimize total cost,
    * ties → fewer tokens, ties → lexicographically smallest chr(31)-joined
    * path. An unconditional single-char UNK transition (cost [[UnkCost]])
    * keeps every position reachable; both engines apply it even when the
    * char is a vocab piece (the cheaper tuple wins identically).
    */
  private def viterbi(
      syms: Array[String],
      costs: Map[String, Long]): Array[String] = {
    val L = syms.length
    if (L == 0) return Array.empty
    val bc = new Array[Long](L + 1)
    val bt = new Array[Int](L + 1)
    val bp = new Array[String](L + 1)
    bp(0) = ""
    var p = 1
    while (p <= L) {
      var bestC = Long.MaxValue
      var bestT = Int.MaxValue
      var bestP: String = null
      val maxL = math.min(MaxPieceLen, p)
      var l = 1
      while (l <= maxL) {
        val piece = syms.slice(p - l, p).mkString
        val prevC = bc(p - l)
        def consider(stepCost: Long): Unit = {
          val c = prevC + stepCost
          if (c < bestC) {
            bestC = c; bestT = bt(p - l) + 1
            bestP = bp(p - l) + PathDelim + piece
          } else if (c == bestC) {
            val t = bt(p - l) + 1
            val path = bp(p - l) + PathDelim + piece
            if (t < bestT || (t == bestT && path.compareTo(bestP) < 0)) {
              bestT = t; bestP = path
            }
          }
        }
        costs.get(piece).foreach(consider)
        if (l == 1) consider(UnkCost)
        l += 1
      }
      bc(p) = bestC; bt(p) = bestT; bp(p) = bestP
      p += 1
    }
    bp(L).split(PathDelim).filter(_.nonEmpty)
  }

  /** Segment one word with a frozen vocabulary. */
  def encodeWord(word: String, vocab: Seq[(String, Int)]): Array[String] =
    viterbi(codepointSyms(word), vocab.map { case (p, c) => p -> c.toLong }.toMap)

  /** Pieces of a single WORD column (keeps word alignment for gates that
    * index per word, unlike [[tokens]] which flattens the document).
    * Per-task memoized like [[tokens]].
    */
  def wordPieces(word: Column, vocab: Seq[(String, Int)]): Column = {
    val costs = vocab.map { case (p, c) => p -> c.toLong }.toMap
    val cache = new scala.collection.mutable.HashMap[String, Seq[String]]
    val enc = udf { (w: String) =>
      if (w == null) Seq.empty[String]
      else cache.getOrElseUpdate(w, viterbi(codepointSyms(w), costs).toSeq)
    }
    enc(word)
  }

  /** Column of unigram tokens for a frozen vocabulary, per-task memoized
    * (Zipfian word frequency → most words hit the cache). Words split
    * exactly like [[Bpe.bpeWords]] so the BPE/unigram fertility comparison
    * is apples-to-apples and the oracle split regex is shared.
    */
  def tokens(text: Column, vocab: Seq[(String, Int)]): Column = {
    val costs = vocab.map { case (p, c) => p -> c.toLong }.toMap
    val cache = new scala.collection.mutable.HashMap[String, Array[String]]
    val enc = udf { (ws: Seq[String]) =>
      if (ws == null) Seq.empty[String]
      else ws.filter(_.nonEmpty).flatMap(w =>
        cache.getOrElseUpdate(w, viterbi(codepointSyms(w), costs)))
    }
    enc(Bpe.bpeWords(text))
  }

  /** Unigram token count for a frozen vocabulary. */
  def tokenCount(text: Column, vocab: Seq[(String, Int)]): Column =
    size(tokens(text, vocab))

  /** The frozen production vocabulary: `train(documents@sf0.01, vocabSize
    * = 72)`. Training is deterministic, so this constant is reproducible
    * from the corpus — UnigramSpec pins that provenance (the
    * [[Bpe.Frozen]] pattern). Gated queries encode with this table (train
    * once, encode everywhere); the DuckDB oracle replays the same table,
    * generated from this constant so the two sides cannot drift.
    */
  val Frozen: Seq[(String, Int)] = Seq(
    ("a", 500), ("agg", 496), ("b", 1478), ("batch", 491),
    ("big", 500), ("c", 1478), ("column", 491), ("custom", 491),
    ("d", 1478), ("data", 495), ("dup", 1008), ("e", 1478),
    ("er", 491), ("f", 1478), ("fast", 504), ("filter", 491),
    ("g", 1478), ("group", 500), ("h", 1478), ("hash", 489),
    ("i", 1478), ("j", 1478), ("join", 487), ("k", 1478),
    ("key", 497), ("l", 1478), ("line", 495), ("m", 1478),
    ("merge", 494), ("n", 1478), ("o", 1478), ("order", 495),
    ("p", 1478), ("part", 500), ("q", 1478), ("query", 501),
    ("r", 1478), ("row", 490), ("s", 1478), ("scan", 491),
    ("slow", 494), ("small", 492), ("sort", 501), ("spark", 500),
    ("stream", 498), ("t", 1478), ("table", 495), ("the", 507),
    ("u", 1478), ("v", 1478), ("value", 497), ("vector", 495),
    ("w", 1478), ("window", 499), ("y", 1478))

  /** Target vocabulary size of [[Frozen]] (shared with the gate). */
  val FrozenVocabSize = 72
}
