package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis primitives for large-scale training-data pipelines.
  *
  * Everything here compiles to built-in Catalyst expressions (string ops +
  * higher-order array functions with Scala Column lambdas) — no UDFs — so
  * whole-stage codegen covers the full pipeline and the same logic is
  * reproducible in ANSI SQL for the correctness oracles. All hashes are
  * md5-derived (engine-portable), never engine-native hash functions.
  */
object TextFunctions {

  /** Whitespace tokenization: `split(trim(text), '\s+')`. */
  def words(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct word set. */
  def wordSet(text: Column): Column = array_distinct(words(text))

  /** Distinct n-CHARACTER shingles — the unit for similarity over
    * unsegmented text (CJK, Thai, OCR output with lost spacing) where
    * whitespace words degenerate to whole lines. Codepoint-positioned
    * (`substr` counts codepoints on both engines); text shorter than `n`
    * chars yields an empty array (cannot shingle, mirroring the word
    * case). Pure codegen HOF, shuffle-free.
    */
  def charShingleSet(text: Column, n: Int): Column =
    when(length(text) < n, array().cast("array<string>"))
      .otherwise(
        array_distinct(
          transform(
            sequence(lit(1), length(text) - n + 1),
            i => text.substr(i, lit(n)))))

  /** `n`-word shingles (sliding windows joined by single spaces), 1-based
    * positions; documents shorter than `n` words yield an empty array.
    */
  def shingles(ws: Column, n: Int): Column = {
    // zip_with over shifted slices instead of indexing: higher-order lambdas
    // are interpreted, so an `element_at(ws, i+j)` body re-evaluates the
    // whole `ws` subtree (a regex split!) per element per index — measured
    // ~170 splits/row. Each slice here evaluates `ws` exactly once per row;
    // trailing windows that run off the end null out (concat propagates
    // null) and array_compact drops them, which also handles docs shorter
    // than n naturally.
    val joined = (1 until n).foldLeft(ws) { (acc, j) =>
      zip_with(acc, slice(ws, lit(j + 1), size(ws)), (a, b) =>
        concat(a, lit(" "), b))
    }
    array_compact(joined)
  }

  /** Distinct `n`-gram shingle set of a text column. */
  def shingleSet(text: Column, n: Int): Column =
    array_distinct(shingles(words(text), n))

  /** 60-bit portable hash: first 15 hex chars of md5, base-16 → bigint.
    * DuckDB equivalent: `CAST(('0x'||substr(md5(x),1,15)) AS UBIGINT)`.
    */
  def hash61(c: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.Hash61F(
        org.apache.spark.sql.graft.ColumnShim.expression(c.cast(StringType))))

  /** The original expression-chain formulation (kept as the portable
    * reference implementation for the native [[hash61]]).
    */
  def hash61Hof(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** hash61 reduced mod 1e9+7 — small enough that `a*h+b` never overflows
    * signed 64-bit for a,b < 2e9 (needed by MinHash permutations).
    */
  def hashMod(c: Column): Column = hash61(c) % lit(1000000007L)

  /** Token count. */
  def tokenCount(text: Column): Column = size(words(text))

  /** BPE-ish subword token estimate: one piece per word plus an extra piece
    * per 4 characters beyond the first 4 (char/4 heuristic, no external
    * vocab — portable and deterministic).
    */
  def bpeTokenEstimate(text: Column): Column = {
    val w = words(text)
    size(w).cast(LongType) + aggregate(
      transform(w, x => floor(greatest(length(x) - 4, lit(0)) / 4).cast(LongType)),
      lit(0L),
      (acc, x) => acc + x)
  }

  /** Sum of token lengths (exact integer). */
  def totalTokenChars(text: Column): Column =
    aggregate(
      transform(words(text), x => length(x).cast(LongType)),
      lit(0L),
      (acc, x) => acc + x)

  /** Mean token length (double, derived from exact integer sums). */
  def meanTokenLength(text: Column): Column =
    totalTokenChars(text).cast(DoubleType) /
      size(words(text)).cast(DoubleType)

  /** Count of tokens found in `stopwords` (exact integer, order-free). */
  def stopwordHits(text: Column, stopwords: Seq[String]): Column = {
    val arr = array(stopwords.map(lit): _*)
    size(filter(words(text), w => array_contains(arr, w)))
  }

  /** Ratio of tokens found in `stopwords`. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    stopwordHits(text, stopwords).cast(DoubleType) /
      size(words(text)).cast(DoubleType)

  /** Text normalization for pretraining corpora: strip control characters,
    * collapse whitespace runs to single spaces, trim. Pure `regexp_replace`
    * chain — codegen, and reproducible in the DuckDB oracle with the same
    * patterns.
    */
  def cleanText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(text, "[\\p{Cntrl}]", " "),
      "\\s{2,}",
      " "))

  /** Unicode NFC normalization (canonical composition): the first step of
    * any multilingual pretraining cleanup — crawls mix composed (`é`) and
    * decomposed (`e`+U+0301) forms of the same text, which defeats exact
    * dedup, hashing, and tokenizer vocab lookups unless canonicalized.
    * Native codegen expression ([[org.apache.spark.sql.graft.NfcNormalizeF]]
    * — Spark has no built-in; a UDF would break whole-stage codegen) with a
    * zero-allocation fast path for already-NFC text. DuckDB oracle:
    * `nfc_normalize(x)` — both sides implement Unicode canonical
    * composition, byte-identical on well-formed text.
    */
  def nfcNormalize(text: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.NfcNormalizeF(
        org.apache.spark.sql.graft.ColumnShim.expression(
          text.cast(StringType))))

  /** Full pretraining text canonicalization: NFC, then control-char strip +
    * whitespace collapse ([[cleanText]]). Map-side, fully codegen.
    */
  def canonicalizeText(text: Column): Column =
    cleanText(nfcNormalize(text))

  /** Homoglyph-confusable mapping (UTS #39 skeleton, the high-frequency
    * subset): Cyrillic and Greek letters visually identical to Latin,
    * fullwidth ASCII forms, and the invisible zero-width class. Exposed
    * as parallel from/to strings so a relational oracle can replay the
    * identical `translate` (the extra trailing from-chars with no to
    * counterpart are DELETED — the zero-width strip — same contract in
    * Spark and DuckDB).
    */
  private val confusablePairs: Seq[(Char, Char)] =
    // Cyrillic lowercase lookalikes
    Seq(
      '\u0430' -> 'a', '\u0435' -> 'e', '\u043E' -> 'o', '\u0440' -> 'p',
      '\u0441' -> 'c', '\u0443' -> 'y', '\u0445' -> 'x', '\u0456' -> 'i',
      '\u0455' -> 's', '\u0458' -> 'j',
      // Cyrillic uppercase
      '\u0410' -> 'A', '\u0412' -> 'B', '\u0415' -> 'E', '\u041A' -> 'K',
      '\u041C' -> 'M', '\u041D' -> 'H', '\u041E' -> 'O', '\u0420' -> 'P',
      '\u0421' -> 'C', '\u0422' -> 'T', '\u0425' -> 'X',
      // Greek lowercase
      '\u03B1' -> 'a', '\u03B5' -> 'e', '\u03B9' -> 'i', '\u03BA' -> 'k',
      '\u03BD' -> 'v', '\u03BF' -> 'o', '\u03C1' -> 'p', '\u03C4' -> 't',
      '\u03C5' -> 'u',
      // Greek uppercase
      '\u0391' -> 'A', '\u0392' -> 'B', '\u0395' -> 'E', '\u0396' -> 'Z',
      '\u0397' -> 'H', '\u0399' -> 'I', '\u039A' -> 'K', '\u039C' -> 'M',
      '\u039D' -> 'N', '\u039F' -> 'O', '\u03A1' -> 'P', '\u03A4' -> 'T',
      '\u03A5' -> 'Y', '\u03A7' -> 'X') ++
      // fullwidth digits / letters -> ASCII
      (0 to 9).map(d => (('\uFF10' + d).toChar, ('0' + d).toChar)) ++
      (0 until 26).flatMap(i => Seq(
        (('\uFF21' + i).toChar, ('A' + i).toChar),
        (('\uFF41' + i).toChar, ('a' + i).toChar)))

  /** Invisible characters the skeleton DELETES (zero-width space/joiners,
    * word joiner, BOM) \u2014 appended to the from-string past the to-string's
    * end, which both engines' `translate` treat as removal.
    */
  private val invisibles = "\u200B\u200C\u200D\u2060\uFEFF"

  val ConfusableFrom: String = confusablePairs.map(_._1).mkString + invisibles
  val ConfusableTo: String = confusablePairs.map(_._2).mkString

  /** Confusable skeleton: fold homoglyphs to their Latin targets and strip
    * invisibles — the dedup-evasion countermeasure. A doc obfuscated by
    * swapping Latin letters for Cyrillic/Greek lookalikes (or padding with
    * zero-width chars) defeats exact AND shingle dedup; its skeleton is
    * byte-identical to the original's, so hashing THIS column catches the
    * evasion. Pure `translate` projection: map-side, codegen, replayable
    * in any engine with the shared from/to constants.
    */
  def confusableSkeleton(text: Column): Column =
    translate(text, ConfusableFrom, ConfusableTo)

  /** SQuAD-style answer normalization (the `normalize_answer` used by
    * extractive-QA exact-match scoring and QA decontamination): lowercase
    * → strip ASCII punctuation → drop English articles (a / an / the) →
    * collapse whitespace. Exact dedup or [[graft.ops.Decontaminate]] over
    * THIS column catches eval answers that differ only in case, "the", or
    * punctuation. Pure codegen, shuffle-free; every regex stays inside the
    * RE2-compatible subset ([[:punct:]] class, `\b` boundaries) so DuckDB
    * oracles replay it byte-identically.
    */
  def normalizeAnswer(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(lower(text), "[\\p{Punct}]", " "),
        "\\b(a|an|the)\\b",
        " "),
      "\\s+",
      " "))

  /** C4-style line-quality filtering: split `text` on newlines, keep only
    * lines with at least `minWords` whitespace words that end in terminal
    * punctuation (`. ! ? "` optionally followed by a closing quote), and
    * rejoin the survivors with newlines. The boilerplate-removal rule from
    * the C4 pipeline (Raffel et al. 2020 §2.2), as pure array/regex
    * expressions — per-row codegen, shuffle-free at any corpus size.
    *
    * Returns the cleaned text; an all-boilerplate document comes back
    * empty (filter on `length > 0` to drop such docs).
    */
  def keepQualityLines(text: Column, minWords: Int = 3): Column = {
    val lines = split(text, "\n")
    val kept = filter(
      lines,
      l =>
        size(split(trim(l), "\\s+")) >= minWords &&
          trim(l).rlike("[.!?\"][\"')\\]]?$"))
    array_join(kept, "\n")
  }

  /** HTML boilerplate stripping — the first text-level step on raw crawl
    * payloads: drop `<script>`/`<style>` blocks WITH their content (code
    * and CSS are not prose), strip every remaining tag, then decode the
    * common entities (`&lt; &gt; &quot; &#39; &nbsp;`, with `&amp;`
    * last — the double-escape rule), and collapse whitespace.
    * Deliberately regex-simple and deterministic (a corpus
    * pipeline wants throughput + reproducibility, not a DOM): pure
    * codegen `regexp_replace` chain inside the RE2-compatible subset, so
    * DuckDB oracles replay it byte-identically. `&amp;` decodes LAST so
    * `&amp;lt;` becomes the literal `&lt;` (not `<`) — the standard
    * double-escape rule.
    */
  def stripHtml(text: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(text, "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>",
      " ")
    val noTags = regexp_replace(noBlocks, "(?s)<[^>]*>", " ")
    val entities = Seq(
      "&lt;" -> "<",
      "&gt;" -> ">",
      "&quot;" -> "\"",
      "&#39;" -> "'",
      "&nbsp;" -> " ")
    val decoded = entities.foldLeft(noTags) { case (acc, (e, v)) =>
      regexp_replace(acc, e, java.util.regex.Matcher.quoteReplacement(v))
    }
    val amp = regexp_replace(decoded, "&amp;", "&")
    trim(regexp_replace(amp, "\\s+", " "))
  }

  /** Sentence segmentation: split on whitespace FOLLOWING terminal
    * punctuation (`.`, `!`, `?`, optionally a closing quote/bracket).
    * RE2-compatible (no lookbehind): a marker (U+001F) is inserted after
    * each boundary and split on — DuckDB replays the same two steps
    * byte-identically. Trailing text without terminal punctuation is its
    * own final sentence; empty input yields no sentences.
    */
  def sentences(text: Column): Column = {
    val marked = regexp_replace(
      trim(text),
      "([.!?][\"')\\]]?)\\s+",
      "$1\u001f")
    array_remove(transform(split(marked, "\u001f"), s => trim(s)), "")
  }

  /** PII redaction: emails, IPv4 addresses and phone-shaped digit runs
    * replaced by typed placeholders. Patterns are deliberately simple and
    * deterministic (a corpus pipeline wants recall + reproducibility, not a
    * validator); order matters — emails first so their host part is not
    * half-eaten by the phone pattern, IPs before phones so dotted quads
    * don't match the digit-run pattern.
    */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(
      text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
      "<EMAIL>")
    val ip = regexp_replace(
      email,
      "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b",
      "<IP>")
    regexp_replace(
      ip,
      "\\+?\\d[\\d\\s().-]{7,}\\d",
      "<PHONE>")
  }

  /** Luhn checksum validity of a pure-digit string column (ISO/IEC 7812 —
    * the check digit every real payment-card number carries): from the
    * RIGHT, double every second digit, subtract 9 when over 9, and the
    * total must divide by 10. Bare `\d{13,19}` PII regexes flag order
    * ids, timestamps and hashes as card numbers; ~90% of random digit
    * runs fail Luhn, so validating candidates kills the false-positive
    * class that makes regex-only CC redaction unusable on web corpora.
    *
    * Pure built-ins (reverse/transform/aggregate — codegen'd, no UDF);
    * exact integer arithmetic, so the verdict is engine-replayable
    * (DuckDB replays with a 1-based range transform over the reversed
    * string). Candidates outside 13–19 digits are invalid by definition.
    */
  def luhnValid(digits: Column): Column = {
    val ds = reverse(filter(split(digits, ""), x => x =!= lit("")))
    val total = aggregate(
      transform(ds, (x, i) => {
        val d = x.cast(IntegerType)
        val dd = when(i % 2 === 1, d * 2).otherwise(d) // 0-based: odd = the
                                                       // "every second from
                                                       // the right" digits
        when(dd > 9, dd - 9).otherwise(dd)
      }),
      lit(0),
      (acc, v) => acc + v)
    length(digits).between(13, 19) && total % 10 === 0
  }

  /** Card-number candidates of a text column: maximal-per-position
    * 13–19 digit runs (`regexp_extract_all` — RE2/Java agree on
    * leftmost-greedy here, part of the shared-subset discipline).
    */
  def cardCandidates(text: Column): Column =
    regexp_extract_all(coalesce(text, lit("")), lit("\\d{13,19}"), lit(0))

  /** Per-document payment-card audit: candidate digit runs found vs how
    * many pass [[luhnValid]] — the precision report a PII pass publishes
    * before redacting (candidates minus valid = the false-positive mass a
    * bare regex would have redacted). Map-side only.
    */
  def cardAudit(text: Column): Column = {
    val cands = cardCandidates(text)
    struct(
      size(cands).cast(LongType).as("n_candidates"),
      size(filter(cands, c => luhnValid(c))).cast(LongType).as("n_luhn_valid"))
  }

  /** Redact ONLY Luhn-valid card numbers (the checksum-gated upgrade of
    * [[redactPii]]'s class of rules): candidates that fail the checksum
    * are left untouched. Fold over the candidate list with `aggregate` —
    * still pure built-ins.
    *
    * The replacement is anchored on digit boundaries (`(?<!\d)…(?!\d)`):
    * a valid candidate's digits appearing as a SUBSTRING of a longer
    * digit run elsewhere in the text (e.g. a 20+-digit id that happens to
    * contain a valid 16-digit number) are not a card occurrence and stay
    * untouched — only standalone runs are redacted. Lookbehind keeps this
    * Spark-side only (Java regex); it has no hash-gated DuckDB oracle by
    * design (RE2 lacks lookbehind), unlike [[cardAudit]].
    */
  def redactValidCards(text: Column, marker: String = "<CC>"): Column =
    aggregate(
      cardCandidates(text),
      coalesce(text, lit("")),
      (acc, c) =>
        // candidates are pure digits: no regex quoting needed in the pattern
        when(
          luhnValid(c),
          regexp_replace(
            acc,
            concat(lit("(?<!\\d)"), c, lit("(?!\\d)")),
            lit(marker))).otherwise(acc))

  /** Tokens of `text` with the given words removed (vocabulary pruning —
    * e.g. the corpus-frequency top-k from a histogram pass).
    */
  def pruneWords(text: Column, remove: Seq[String]): Column = {
    val arr = array(remove.map(lit): _*)
    filter(words(text), w => !array_contains(arr, w))
  }

  /** Within-document n-gram repetition ratio (Gopher-style "fraction of
    * duplicated n-grams" quality rule): 1 − distinct/total over the doc's
    * n-word shingles, null when the doc has no n-grams. Pure array
    * expressions — per-row codegen, shuffle-free at any corpus size. The
    * division is one IEEE op over two exact integers (oracle-portable).
    */
  def dupNgramRatio(text: Column, n: Int): Column = {
    val all = shingles(words(text), n)
    val total = size(all)
    when(
      total > 0,
      lit(1.0) - size(array_distinct(all)).cast(DoubleType) /
        total.cast(DoubleType))
  }

  /** Per-element occurrence counts within one array: `selfCounts(a)[i]` =
    * how many times `a[i]` occurs in `a`. O(len²) comparisons per ROW (no
    * shuffle, no explode) — fine for line/gram counts bounded by document
    * size; pre-chunk pathological documents first. The input should be a
    * staged attribute (not a recomputed expression) so the nested lambda
    * reads it for free.
    */
  def selfCounts(arr: Column): Column =
    transform(arr, x => size(filter(arr, y => y === x)))

  /** Gopher-style duplicate line fraction: 1 − distinct/total lines (Rae
    * et al. 2021, Table A1 repetition rules). Null for empty input arrays.
    */
  def dupElemFrac(arr: Column): Column =
    when(
      size(arr) > 0,
      lit(1.0) - size(array_distinct(arr)).cast(DoubleType) /
        size(arr).cast(DoubleType))

  /** Gopher-style duplicate line CHARACTER fraction: characters belonging
    * to lines that occur more than once, over all line characters. Null
    * when the array is empty or all-empty.
    */
  def dupElemCharFrac(arr: Column): Column = {
    val dupChars = aggregate(
      zip_with(arr, selfCounts(arr), (l, c) =>
        when(c > 1, length(l).cast(LongType)).otherwise(lit(0L))),
      lit(0L),
      (acc, x) => acc + x)
    val allChars = aggregate(
      transform(arr, l => length(l).cast(LongType)),
      lit(0L),
      (acc, x) => acc + x)
    when(allChars > 0, dupChars.cast(DoubleType) / allChars.cast(DoubleType))
  }

  /** Gopher-style top n-gram character fraction: characters covered by the
    * single most frequent n-gram (occurrences × gram length) over the
    * document's characters. Ties resolve to the lexicographically smallest
    * gram — deterministic and oracle-portable. Null when the doc has no
    * n-grams.
    */
  def topNgramCharFrac(grams: Column, textLen: Column): Column = {
    // struct max: highest count, ties to the lexicographically LARGEST
    // gram (struct ordering) — no lambda-captured aggregate, so the
    // O(len²) count pass runs once per evaluation, not once per element
    val top = array_max(
      zip_with(grams, selfCounts(grams), (g, c) =>
        struct(c.as("cnt"), g.as("gram"))))
    when(
      size(grams) > 0 && textLen > 0,
      (top.getField("cnt") * length(top.getField("gram"))).cast(DoubleType) /
        textLen.cast(DoubleType))
  }

  /** Gopher-style duplicate n-gram character fraction: occurrence-weighted
    * characters of every n-gram that occurs more than once, over the
    * document's characters. Occurrence-weighted (overlaps counted per
    * occurrence, not per distinct character position, so values can exceed
    * 1 on highly repetitive docs) — the cheap published approximation;
    * threshold accordingly. Null when the doc has no n-grams.
    */
  def dupNgramCharFrac(grams: Column, textLen: Column): Column = {
    val dupChars = aggregate(
      zip_with(grams, selfCounts(grams), (g, c) =>
        when(c > 1, length(g).cast(LongType)).otherwise(lit(0L))),
      lit(0L),
      (acc, x) => acc + x)
    when(
      size(grams) > 0 && textLen > 0,
      dupChars.cast(DoubleType) / textLen.cast(DoubleType))
  }

  /** Simpson concentration index over an array's elements:
    * `Σ_w c_w² / n²` (the probability two random draws coincide) — 1/n for
    * an all-distinct doc, → 1 for one-token spam. The LOG-FREE diversity
    * measure: Shannon entropy needs `log`, whose low bits are libm- and
    * engine-dependent, while this is two exact integers and one division —
    * bit-portable. Computed as `Σ_i c(x_i) / n²` (each occurrence
    * contributes its own element's count, which sums the squares without a
    * distinct pass). Input must be a staged attribute ([[selfCounts]]).
    * Null for empty arrays.
    */
  def simpsonConcentration(arr: Column): Column =
    when(
      size(arr) > 0,
      aggregate(selfCounts(arr), lit(0L), (a, x) => a + x.cast(LongType))
        .cast(DoubleType) /
        (size(arr).cast(DoubleType) * size(arr).cast(DoubleType)))

  /** Punctuation character ratio over all characters. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\p{Punct}]", "")))
      .cast(DoubleType) / length(text).cast(DoubleType)

  // ------------------------------------------------------------------
  // Language identification (stopword-hit heuristic)
  // ------------------------------------------------------------------

  /** Per-language stopword profiles (tiny, deterministic; order = tie-break
    * priority).
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr" -> Seq("le", "les", "et", "est", "une", "dans", "que", "pour", "sur", "pas"),
    "es" -> Seq("el", "los", "y", "es", "una", "en", "por", "con", "para", "del"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不", "这", "个"))

  /** Predicted language: profile with the most stopword hits; ties resolved
    * by profile order; zero hits → 'und'. Deterministic and expressible in
    * the DuckDB oracle with the same case-chain.
    */
  def langId(text: Column): Column = {
    val hits = LangProfiles.map { case (lang, sw) =>
      lang -> stopwordHits(text, sw)
    }
    val maxHits = greatest(hits.map(_._2): _*)
    val chain = hits.foldRight(lit("und")) { case ((lang, h), elseCol) =>
      when(h === maxHits && maxHits > 0, lit(lang)).otherwise(elseCol)
    }
    chain
  }

  /** Unicode script ranges for [[scriptPpm]] — codepoint classes shared
    * verbatim with the DuckDB oracle (both regex engines accept the
    * `\x{hhhh}` class syntax), so the counts are engine-exact. Name →
    * character-class body (without the brackets).
    */
  private[graft] val ScriptClasses: Seq[(String, String)] = Seq(
    "latin" -> "A-Za-z",
    "cyrillic" -> "\\x{0400}-\\x{04FF}",
    "arabic" -> "\\x{0600}-\\x{06FF}",
    "cjk" -> "\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}\\x{AC00}-\\x{D7AF}",
    "digit" -> "0-9")

  /** Per-script character count: length delta over removing the class. */
  def scriptCount(text: Column, classBody: String): Column =
    (length(text) -
      length(regexp_replace(text, s"[$classBody]", ""))).cast(LongType)

  /** Script-mix profile: characters of `script` per million characters —
    * the ROUTING signal complementary to the stopword [[langId]]: langId
    * needs whitespace-tokenized stopwords (useless on CJK), script ratios
    * work on any text and catch mixed-script spam (Latin text stuffed
    * with CJK SEO tokens, Cyrillic homoglyph attacks) that per-language
    * models never see. Exact integer ppm; 0 for empty text.
    */
  def scriptPpm(text: Column, script: String): Column = {
    val body = ScriptClasses.toMap.apply(script)
    when(length(text) === 0, lit(0L))
      .otherwise(
        intDivCol(
          scriptCount(text, body) * 1000000L,
          length(text).cast(LongType)))
  }

  /** Composite quality score in [0,1]: weighted mix of length saturation,
    * stopword ratio and mean-word-length band — the standard cheap quality
    * gate shape for pretraining corpora. Deterministic arithmetic only.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast(DoubleType) / 400.0d, lit(1.0d))
    val swScore =
      least(stopwordRatio(text, LangProfiles.head._2) * 4.0d, lit(1.0d))
    val mwl = meanTokenLength(text)
    val mwlScore = when(mwl >= 3.0d && mwl <= 8.0d, 1.0d).otherwise(0.5d)
    lenScore * 0.4d + swScore * 0.3d + mwlScore * 0.3d
  }

  /** Code-vs-prose detection signals — mixture accounting and routing
    * (code gets different dedup granularity, quality rules, and mixture
    * weight than prose, so the split must happen early). Exact integer
    * ppm signals, engine-replayable:
    *
    *   - `symbol_ppm`: fraction of non-whitespace characters in the
    *     code-symbol class `{}()[];=<>`,
    *   - `indent_ppm`: fraction of lines starting with whitespace
    *     (indentation is prose-rare, code-universal),
    *   - `kw_hits`: count of language-keyword tokens
    *     (def/class/return/import/…) — token-exact, not substring.
    *
    * `isCode` combines them with fixed integer thresholds. Shuffle-free
    * per-row expressions; thresholds deliberately simple and documented
    * (a router wants reproducibility and explainability, not a model —
    * P69's hashed classifier is the learned alternative).
    */
  private val CodeKeywords = Seq(
    "def", "class", "return", "import", "function", "var", "let", "const",
    "public", "void", "int", "if", "else", "for", "while", "struct", "fn")

  private def intDivCol(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graft.ColumnShim.expression(a),
        org.apache.spark.sql.graft.ColumnShim.expression(b)))

  def codeSymbolPpm(text: Column): Column = {
    val nonWs = length(regexp_replace(text, "\\s", ""))
    val symbols = length(regexp_replace(text, "[^{}()\\[\\];=<>]", ""))
    when(nonWs === 0, lit(0L)).otherwise(
      intDivCol(symbols.cast(LongType) * 1000000L, nonWs.cast(LongType)))
  }

  def codeIndentPpm(text: Column): Column = {
    val lines = split(text, "\n")
    val n = size(lines)
    val indented = size(filter(lines, l => l.rlike("^[ \\t]")))
    when(n === 0, lit(0L)).otherwise(
      intDivCol(indented.cast(LongType) * 1000000L, n.cast(LongType)))
  }

  def codeKeywordHits(text: Column): Column = {
    val kws = array(CodeKeywords.map(lit): _*)
    size(filter(words(text), w => array_contains(kws, w))).cast(LongType)
  }

  /** Heuristic router decision: symbol-heavy OR (indented AND keyworded). */
  def isCode(text: Column): Column =
    codeSymbolPpm(text) >= 60000L ||
      (codeIndentPpm(text) >= 300000L && codeKeywordHits(text) >= 3L)

  /** gzip-compressibility quality signal: `⌊compressed·10⁶/raw⌋` over the
    * UTF-8 bytes (DEFLATE level 6, raw stream). Highly compressible text
    * (low ppm) = repetitive boilerplate; incompressible (ppm near or
    * above 10⁶) = noise/binary — Gopher-style suites filter both tails.
    * Deterministic on a fixed JVM (the JDK bundles its own zlib) but NOT
    * engine-portable, so the op is [T] spec-verified, not DuckDB-gated —
    * the same class as the HLL/Misra-Gries sketches. Empty text maps to
    * 10⁶ (neutral).
    */
  def compressionRatioPpm(text: Column, level: Int = 6): Column = {
    val raw = octet_length(text).cast(LongType)
    val compressed = org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.DeflateSizeF(
        org.apache.spark.sql.graft.ColumnShim.expression(
          text.cast(StringType)),
        level))
    when(raw === 0L, lit(1000000L))
      .otherwise(intDivCol(compressed * 1000000L, raw))
  }

  /** The classic UTF-8-bytes-decoded-as-cp1252 artifact sequences
    * ("é" → "Ã©", "'" → "â€™", …) — each is a
    * near-impossible character run in clean text, so their presence is a
    * high-precision mojibake signal (the Unicode-fixing literature's
    * standard marker set).
    */
  private[graft] val MojibakeSeqs: Seq[String] = Seq(
    "\u00C3\u00A9", "\u00C3\u00A8", "\u00C3\u00BC", "\u00C3\u00A4",
    "\u00C3\u00B6", "\u00E2\u20AC\u2122", "\u00E2\u20AC\u0153")

  /** U+FFFD replacement characters — what a decoder already gave up on. */
  def replacementCharCount(text: Column): Column =
    (length(text) - length(translate(text, "\uFFFD", ""))).cast(LongType)

  /** C1 control characters (U+0080–U+009F): valid cp1252 punctuation
    * bytes decoded as latin-1 land here — clean text never contains them.
    */
  def c1ControlCount(text: Column): Column =
    (length(text) -
      length(regexp_replace(text, "[\u0080-\u009F]", ""))).cast(LongType)

  /** Occurrences of the [[MojibakeSeqs]] marker sequences (each counted by
    * length delta over its removal, exact integer division by the
    * sequence length).
    */
  def mojibakeSeqCount(text: Column): Column =
    MojibakeSeqs
      .map(s =>
        intDivCol(
          (length(text) - length(regexp_replace(text, s, "")))
            .cast(LongType),
          lit(s.length.toLong)))
      .reduce(_ + _)

  /** Encoding-quality filter signal: artifact characters (replacement +
    * C1 + mojibake-marker hits) per million characters — exact integer
    * arithmetic, engine-portable. A corpus ingest drops or re-decodes
    * documents above a small threshold; `0` = clean.
    */
  def encodingArtifactPpm(text: Column): Column = {
    val n = replacementCharCount(text) + c1ControlCount(text) +
      mojibakeSeqCount(text)
    when(length(text) === 0, lit(0L))
      .otherwise(intDivCol(n * 1000000L, length(text).cast(LongType)))
  }

  /** Winnowing fingerprints: k-gram shingle hashes, minimum per sliding
    * window of `w` consecutive hashes (Schleimer et al., SIGMOD'03 winnowing
    * scheme) — used through [[graft.ops.Dedup.winnowingFingerprints]].
    */
  def shingleHashes(text: Column, n: Int): Column =
    transform(shingles(words(text), n), s => hash61(s))
}
