package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** WordPiece tokenizer ENCODE — greedy longest-match-first segmentation
  * (Wu et al. 2016, the BERT tokenizer): the third of the three
  * production subword families next to [[Bpe]] (merge replay) and
  * [[Unigram]] (Viterbi DP). Continuation pieces carry the literal `##`
  * prefix; a word with ANY unmatchable position collapses to one `[UNK]`
  * token — the all-or-nothing BERT contract, not a per-char fallback
  * (that is [[Unigram]]'s UnkCost transition).
  *
  * Greedy longest-match is fully deterministic given a frozen vocabulary
  * — no costs, no tie-breaks (at most one piece of each length matches at
  * a position) — so the segmentation is engine-replayable exactly: the
  * DuckDB oracle unrolls one CTE stage per emitted token, each stage
  * picking the longest matching piece at the cursor.
  *
  * Positions are Unicode CODEPOINT positions (the [[Unigram]] rule —
  * DuckDB's substr counts codepoints, a UTF-16 cursor would diverge on
  * non-BMP input).
  *
  * Scale posture = the tokenizer family's: encoding is a per-task-memoized
  * UDF over split words (the documented BPE-trellis UDF exception class —
  * a greedy cursor loop is inherently procedural; Zipfian word frequency
  * makes the memo hit rate high). Nothing is collected; the vocabulary is
  * a broadcast-sized constant.
  */
object WordPiece {

  /** Continuation-piece marker (literal BERT convention). */
  val ContPrefix = "##"

  /** The all-or-nothing failure token. */
  val Unk = "[UNK]"

  /** Maximum piece BODY length (without the `##` marker) considered by
    * the greedy cursor — bounds the DuckDB replay's per-stage join
    * branches exactly like [[Unigram.MaxPieceLen]].
    */
  val MaxPieceLen = 6

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

  /** Segment one word with a frozen vocabulary (pieces WITH their `##`
    * where applicable). Greedy: at each cursor take the longest piece
    * matching (head pieces at position 0, `##`-continuations after); if
    * none matches, the whole word is `[UNK]`.
    */
  def encodeWord(word: String, vocab: Set[String]): Array[String] = {
    val syms = codepointSyms(word)
    if (syms.isEmpty) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < syms.length) {
      val isCont = pos > 0
      var l = math.min(MaxPieceLen, syms.length - pos)
      var hit: String = null
      var hitLen = 0
      while (l >= 1 && hit == null) {
        val body = syms.slice(pos, pos + l).mkString
        val candidate = if (isCont) ContPrefix + body else body
        if (vocab.contains(candidate)) { hit = candidate; hitLen = l }
        l -= 1
      }
      if (hit == null) return Array(Unk)
      out += hit
      pos += hitLen // CODEPOINT advance (hit.length would be UTF-16)
    }
    out.toArray
  }

  /** Pieces of a single WORD column (word alignment preserved for gates
    * that index per word). Per-task memoized like [[Unigram.wordPieces]].
    */
  def wordPieces(word: Column, vocab: Seq[String]): Column = {
    val v = vocab.toSet
    val cache = new scala.collection.mutable.HashMap[String, Seq[String]]
    val enc = udf { (w: String) =>
      if (w == null) Seq.empty[String]
      else cache.getOrElseUpdate(w, encodeWord(w, v).toSeq)
    }
    enc(word)
  }

  /** Flattened document tokens (words split like [[Bpe.bpeWords]] so the
    * three-family fertility comparison is apples-to-apples).
    */
  def tokens(text: Column, vocab: Seq[String]): Column = {
    val v = vocab.toSet
    val cache = new scala.collection.mutable.HashMap[String, Array[String]]
    val enc = udf { (ws: Seq[String]) =>
      if (ws == null) Seq.empty[String]
      else ws.filter(_.nonEmpty).flatMap(w =>
        cache.getOrElseUpdate(w, encodeWord(w, v)))
    }
    enc(Bpe.bpeWords(text))
  }

  /** WordPiece token count for a frozen vocabulary. */
  def tokenCount(text: Column, vocab: Seq[String]): Column =
    size(tokens(text, vocab))

  /** The frozen vocabulary the gates encode with: lowercase a–z single
    * chars as heads AND as `##`-continuations (full alphabetic coverage),
    * plus hand-planted multi-char heads/continuations that force the
    * greedy cursor to take non-trivial longest matches mid-word. Digits
    * and punctuation are deliberately ABSENT, so words containing them
    * exercise the all-or-nothing `[UNK]` path for real.
    */
  val Frozen: Seq[String] = {
    val chars = ('a' to 'z').map(_.toString)
    val heads = Seq(
      "the", "quer", "spark", "join", "data", "part", "win",
      "fast", "slow", "group", "stream", "filter", "sort")
    val conts = Seq(
      "##ing", "##er", "##ed", "##dow", "##ble", "##tion", "##ue", "##ry")
    chars ++ chars.map(ContPrefix + _) ++ heads ++ conts
  }
}
