package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import org.apache.spark.sql.Column

import graft.ops.{Chunking, Dedup, Dsir, IvfInt, Multimodal, Par, Pq, Quantize, Sampling, Similarity, TextFunctions, Urls}

/** LLM-training-data pipeline queries (dedup, text analysis, similarity,
  * multimodal) over the `documents` / `embeddings` tables, each paired with
  * a DuckDB oracle. The oracle SQL for hash-based operators is generated
  * from the same Scala constants (minhash permutations, stopword profiles)
  * so the two sides cannot drift.
  */
object PipelineQueries {

  // Par.fan: the local test parquet is a single row group per table, which
  // would pin every per-row expression below to ONE task; at real scale the
  // guard is a no-op (see Par.fan scaladoc).
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.ops.Par.fan(spark.read.parquet(s"$dir/$name.parquet"))

  /** UNFANNED table read (r16, guide §2.4): for gates whose per-row work
    * is trivial integer arithmetic (the doc_id-derived graph/eval
    * fixtures), [[graft.ops.Par.fan]]'s round-robin exchange buys nothing
    * at any scale — at 100 TB the scan is already thousands of
    * partitions, and at bench scale the fan only multiplies every
    * downstream map stage to 32 tiny tasks. Text/embedding gates (heavy
    * per-row compute) keep the fanned [[t]].
    */
  private def tRaw(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  // Shared composition chains --------------------------------------------
  // One owner for the stage lists of the two e2e composition gates, shared
  // VERBATIM with tools.ScaleSmoke so the 100x smoke can never drift from
  // the driver-gated shape (the Tables.events lesson applied to pipelines).

  /** The `p_curation_e2e` stage list: token-quality gate → exact dedup
    * (keep-min) → benchmark decontamination (strict any-shared-3-gram) →
    * token-budget cut ordered by `score`.
    */
  private[graft] def curationChain(
      corpus: DataFrame,
      bench: DataFrame,
      budget: Long,
      score: Column): DataFrame = {
    // r17 (guide §1.2): the token count (a regex split per row) previously
    // ran three times over the corpus — the quality filter, the exact-dedup
    // pass re-deriving `quality`, and the budget cut's fresh tokenCount.
    // Staged once into __ntok and the quality frame cached, it runs once
    // (the webCurationChain staging pattern + the r16 p_retrieval_e2e
    // cache precedent); values are unchanged.
    val quality = Par.cached(
      corpus
        .withColumn("__ntok", TextFunctions.tokenCount(col("text")))
        .filter(col("__ntok") >= 20))
    val keep = Dedup.exact(quality, "doc_id", "text")
      .select(col("doc_id_kept").as("doc_id"))
    val deduped = quality.join(keep, Seq("doc_id"), "left_semi")
    val clean = graft.ops.Decontaminate.dropContaminated(
      deduped, "doc_id", col("text"), bench, col("text"), n = 3)
    Sampling.tokenBudgetSelect(
      clean, "doc_id",
      col("__ntok"), score,
      budget)
      .drop("__ntok")
  }

  /** The `p_web_curation_e2e` stage list with its intermediates exposed
    * (the smoke asserts row-count invariants on them): canonical-url dedup
    * → per-domain cap → token-quality gate → token-budget cut.
    * `urlDocs` carries (doc_id, url); `fullDocs` supplies text + score.
    */
  private[graft] final case class WebCuration(
      deduped: DataFrame,
      capped: DataFrame,
      result: DataFrame)

  private[graft] def webCurationChain(
      urlDocs: DataFrame,
      fullDocs: DataFrame,
      k: Int,
      budget: Long,
      score: Column): WebCuration = {
    val deduped = Urls.dedupByCanonicalUrl(urlDocs, "doc_id", "url")
    val capped = Urls.capPerDomain(deduped, "doc_id", "url", k)
    val enriched = capped.select(col("doc_id")).join(fullDocs, Seq("doc_id"))
    // token count staged once: it feeds both the quality filter and the
    // budget cut (a second regex split per row would double the chain's
    // dominant per-row cost)
    val quality = enriched
      .withColumn("__ntok", TextFunctions.tokenCount(col("text")))
      .filter(col("__ntok") >= 20)
    WebCuration(
      deduped,
      capped,
      Sampling.tokenBudgetSelect(
        quality, "doc_id", col("__ntok"), score, budget))
  }

  // Shared SQL fragments -------------------------------------------------

  /** DuckDB: whitespace word array of `text`. */
  private val WsSql = "regexp_split_to_array(trim(text), '\\s+')"

  /** DuckDB: distinct 3-word shingles from a word-array column `ws`. */
  private def shinglesSql(ws: String, n: Int = 3): String = {
    val parts = (0 until n).map(j => s"$ws[i+$j]").mkString(" || ' ' || ")
    s"list_distinct(list_transform(range(1, greatest(len($ws) - ${n - 2}, 1)), " +
      s"i -> $parts))"
  }

  /** DuckDB: distinct hashed 3-word shingle set (matches the Spark side,
    * which compares shingle HASH sets so the pairwise intersects run on
    * longs).
    */
  private def hashedShinglesSql(ws: String, n: Int = 3): String =
    s"list_distinct(list_transform(${shinglesSql(ws, n)}, s -> ${hash61Sql("s")}))"

  /** DuckDB: NON-distinct word bigrams of `ws` — a multiset, because DSIR
    * counts gram occurrences (unlike the distinct shingle sets above).
    */
  private def bigramsSql(ws: String): String =
    s"list_transform(range(1, greatest(len($ws), 1)), " +
      s"i -> $ws[i] || ' ' || $ws[i+1])"

  /** Shared decontamination oracle, parameterized on gram length; the frac
    * is an exact int→double division on both engines (bit-identical).
    */
  private def decontaminateSql(n: Int): String =
    s"""WITH bench AS (
       |  SELECT DISTINCT g FROM (
       |    SELECT unnest(${hashedShinglesSql(WsSql, n)}) AS g
       |    FROM documents WHERE doc_id % 50 = 0)),
       |d AS (
       |  SELECT doc_id, len(sh) AS n_doc_ngrams, unnest(sh) AS g FROM (
       |    SELECT doc_id, ${hashedShinglesSql(WsSql, n)} AS sh
       |    FROM documents WHERE doc_id % 50 <> 0))
       |SELECT doc_id,
       |  count(*) AS n_shared_ngrams,
       |  max(n_doc_ngrams) AS n_doc_ngrams,
       |  CAST(count(*) AS DOUBLE) / max(n_doc_ngrams) AS contaminated_frac
       |FROM d JOIN bench USING (g)
       |GROUP BY doc_id""".stripMargin

  /** DuckDB CTE chain replaying [[graft.ops.Dedup.duplicatedSpans]] —
    * k-word sliding windows with positions → hashes duplicated across ≥
    * `minDocs` docs → gaps-and-islands merge — ending in a
    * `spans(doc_id, span_start, span_end, n_windows)` relation (1-based
    * inclusive word positions) plus the word-array CTE `w(doc_id, ws)`.
    * Shared by the span-detection and span-removal oracles.
    */
  private def dupSpansCtes(k: Int, minDocs: Int): String =
    s"""w AS (SELECT doc_id, $WsSql AS ws FROM documents),
       |occ AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
       |    ${hash61Sql(s"array_to_string(list_slice(ws, i, i + ${k - 1}), ' ')")} AS h
       |  FROM w, unnest(range(1, greatest(len(ws) - ${k - 2}, 1))) AS t(i)),
       |dup AS (
       |  SELECT h FROM (SELECT h, doc_id FROM occ GROUP BY h, doc_id)
       |  GROUP BY h HAVING count(*) >= $minDocs),
       |isl AS (
       |  SELECT occ.doc_id, occ.pos,
       |    occ.pos - row_number() OVER (
       |      PARTITION BY occ.doc_id ORDER BY occ.pos) AS g
       |  FROM occ JOIN dup USING (h)),
       |spans AS (
       |  SELECT doc_id, min(pos) AS span_start,
       |    max(pos) + ${k - 1} AS span_end,
       |    CAST(count(*) AS BIGINT) AS n_windows
       |  FROM isl GROUP BY doc_id, g)""".stripMargin

  /** DuckDB: portable 60-bit md5 hash of a string expression. */
  private def hash61Sql(x: String): String =
    s"CAST(CAST(('0x' || substr(md5($x), 1, 15)) AS UBIGINT) AS BIGINT)"

  private def listLit(xs: Seq[Long]): String = xs.mkString("[", ", ", "]")

  // ----- unigram-LM tokenizer oracle machinery (NEW r11) ------------------

  /** Word-position cap shared by the unigram gates and the unrolled DP
    * replay (the oracle generates one CTE stage per position). Words longer
    * than this are excluded IDENTICALLY on both sides; the sf0.01 corpus
    * maxes out at 8 characters, so the cap is slack, not lossy.
    */
  private val UnigramMaxWordLen = 16

  /** The frozen-vocab Viterbi segmentation as unrolled DuckDB CTEs (the
    * P73 integer-exact-replay pattern): expects a `words(doc_id, word_idx,
    * w)` CTE upstream, emits `useg(w, ntok, path)` — per distinct word,
    * the arg-min (cost, ntok, path) segmentation, path chr(31)-delimited.
    * One stage per position p: candidates = vocab pieces of length l
    * ending at p (join on substr) plus the unconditional single-char UNK
    * transition, arg-min by ROW_NUMBER over the same (cost, ntok, path)
    * total order the Scala DP uses. Generated from [[graft.ops.Unigram]]'s
    * frozen constants so SQL and Scala cannot drift.
    */
  private def unigramViterbiCtes: String = {
    val vocab = graft.ops.Unigram.Frozen
    val unk = graft.ops.Unigram.UnkCost
    val maxPiece = graft.ops.Unigram.MaxPieceLen
    def sqlLit(s: String) = "'" + s.replace("'", "''") + "'"
    val vocabRows = vocab
      .map { case (p, c) => s"(${sqlLit(p)}, $c)" }
      .mkString(", ")
    val sb = new StringBuilder
    sb.append(s"uvocab(piece, vcost) AS MATERIALIZED (VALUES $vocabRows),\n")
    sb.append("dw AS MATERIALIZED (SELECT DISTINCT w FROM words),\n")
    sb.append(
      "s0 AS MATERIALIZED (SELECT w, CAST(0 AS BIGINT) AS cost, 0 AS ntok, '' AS path " +
        "FROM dw),\n")
    for (p <- 1 to UnigramMaxWordLen) {
      val branches = scala.collection.mutable.ArrayBuffer.empty[String]
      for (l <- 1 to math.min(maxPiece, p)) {
        branches +=
          s"""SELECT s.w, s.cost + v.vcost AS cost, s.ntok + 1 AS ntok,
             |    s.path || chr(31) || v.piece AS path
             |  FROM s${p - l} s JOIN uvocab v
             |    ON length(v.piece) = $l AND v.piece = substr(s.w, ${p - l + 1}, $l)
             |  WHERE length(s.w) >= $p""".stripMargin
      }
      branches +=
        s"""SELECT s.w, s.cost + $unk AS cost, s.ntok + 1 AS ntok,
           |    s.path || chr(31) || substr(s.w, $p, 1) AS path
           |  FROM s${p - 1} s WHERE length(s.w) >= $p""".stripMargin
      sb.append(s"c$p AS (${branches.mkString("\n  UNION ALL\n  ")}),\n")
      sb.append(
        s"s$p AS MATERIALIZED (SELECT w, cost, ntok, path FROM (SELECT *, " +
          "row_number() OVER (PARTITION BY w ORDER BY cost, ntok, path) " +
          s"AS rn FROM c$p) WHERE rn = 1),\n")
    }
    sb.append(
      "useg AS (" + (1 to UnigramMaxWordLen)
        .map(p => s"SELECT w, ntok, path FROM s$p WHERE length(w) = $p")
        .mkString(" UNION ALL ") + ")")
    sb.toString
  }

  /** The shared `words(doc_id, lang, word_idx, w)` CTEs: bpeWords-split
    * (whitespace + chr(30)), empties dropped BEFORE indexing, capped at
    * [[UnigramMaxWordLen]] AFTER indexing — the exact index semantics of
    * the Spark gates.
    */
  private def unigramWordsCtes: String =
    s"""wraw AS MATERIALIZED (
       |  SELECT doc_id, lang,
       |    list_filter(regexp_split_to_array(trim(lower(text)),
       |      '[\\s\\x1e]+'), x -> x <> '') AS ws
       |  FROM documents),
       |words AS MATERIALIZED (
       |  SELECT * FROM (
       |    SELECT doc_id, lang,
       |      CAST(unnest(range(0, len(ws))) AS INT) AS word_idx,
       |      unnest(ws) AS w
       |    FROM wraw)
       |  WHERE length(w) <= $UnigramMaxWordLen)""".stripMargin

  /** Spark twin of [[unigramWordsCtes]]: (doc_id, lang, word_idx, w) —
    * bpeWords-split, empties dropped before posexplode indexes, length cap
    * applied after.
    */
  private def unigramWordsDf(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        col("lang"),
        posexplode(
          filter(
            split(trim(lower(col("text"))), "[\\s\\x1e]+"),
            w => w =!= "")).as(Seq("word_idx", "w")))
      .filter(length(col("w")) <= UnigramMaxWordLen)

  /** Greedy WordPiece segmentation as unrolled DuckDB CTEs: expects the
    * `words` CTE upstream, emits `wseg(w, path)` — per distinct word the
    * longest-match-first piece path (chr(31)-delimited) or the single
    * `[UNK]` on any dead-end position (the all-or-nothing BERT contract).
    * One stage per emitted token (a piece advances ≥1 codepoint, so
    * [[UnigramMaxWordLen]] stages suffice); per stage one constant-length
    * equi-join branch per piece length picks candidates, `row_number`
    * ORDER BY length DESC takes the greedy winner, and an anti-join
    * collects the dead-ends. Generated from [[graft.ops.WordPiece]]'s
    * frozen constants so SQL and Scala cannot drift.
    */
  private def wordpieceGreedyCtes: String = {
    val vocab = graft.ops.WordPiece.Frozen
    val maxPiece = graft.ops.WordPiece.MaxPieceLen
    def sqlLit(s: String) = "'" + s.replace("'", "''") + "'"
    val rows = vocab.map { p =>
      val cont = if (p.startsWith(graft.ops.WordPiece.ContPrefix)) 1 else 0
      val body = if (cont == 1) p.substring(2) else p
      s"(${sqlLit(p)}, ${sqlLit(body)}, $cont, " +
        s"${body.codePointCount(0, body.length)})"
    }.mkString(", ")
    val sb = new StringBuilder
    sb.append(
      s"wpvocab(piece, body, cont, blen) AS MATERIALIZED (VALUES $rows),\n")
    sb.append("wdw AS MATERIALIZED (SELECT DISTINCT w FROM words),\n")
    sb.append(
      "g0 AS MATERIALIZED (SELECT w, 1 AS pos, '' AS path FROM wdw),\n")
    for (t <- 1 to UnigramMaxWordLen) {
      val branches = (1 to maxPiece).map { l =>
        s"""SELECT g.w, g.pos + $l AS pos,
           |    g.path || chr(31) || v.piece AS path, $l AS blen
           |  FROM g${t - 1} g JOIN wpvocab v
           |    ON v.blen = $l
           |   AND v.cont = CASE WHEN g.pos > 1 THEN 1 ELSE 0 END
           |   AND v.body = substr(g.w, g.pos, $l)
           |  WHERE g.pos + $l - 1 <= length(g.w)""".stripMargin
      }
      sb.append(
        s"c$t AS MATERIALIZED (${branches.mkString("\n  UNION ALL\n  ")}),\n")
      sb.append(
        s"g$t AS MATERIALIZED (SELECT w, pos, path FROM (SELECT *, " +
          "row_number() OVER (PARTITION BY w ORDER BY blen DESC) AS rn " +
          s"FROM c$t) WHERE rn = 1),\n")
      sb.append(
        s"f$t AS MATERIALIZED (SELECT g.w FROM g${t - 1} g " +
          "WHERE g.pos <= length(g.w) " +
          s"AND g.w NOT IN (SELECT w FROM c$t)),\n")
      sb.append(
        s"d$t AS MATERIALIZED (SELECT w, path FROM g$t " +
          "WHERE pos > length(w)),\n")
    }
    sb.append("wseg AS (" +
      (1 to UnigramMaxWordLen)
        .map(t => s"SELECT w, path FROM d$t")
        .mkString(" UNION ALL ") +
      " UNION ALL " +
      (1 to UnigramMaxWordLen)
        .map(t =>
          s"SELECT w, chr(31) || '[UNK]' AS path FROM f$t")
        .mkString(" UNION ALL ") +
      ")")
    sb.toString
  }

  // ----- adversarial fuzz corpora (NEW r11) -------------------------------
  // The Java-regex vs RE2 shared-subset discipline (stripHtml, sentences)
  // is a structural correctness bet: both engines run the SAME pattern
  // strings, and the bet is that they agree on any input the ops accept.
  // These gates stress it with a generated 1000-doc adversarial corpus --
  // nested/unterminated tags, &amp;amp; chains, attribute '>' traps,
  // comments, CDATA, case-mixed script blocks, non-ASCII text, \t \n \f
  // whitespace, decimal-period / abbreviation / quote-bracket sentence
  // traps -- authored ONCE as Scala constants and rendered into the DuckDB
  // oracle via [[duckLit]] (printable-ASCII literal runs + chr(n) for
  // everything else), so the two engines see byte-identical fixtures.
  // Inputs deliberately stay inside the documented subset: U+000B is the
  // one \s divergence between Java and RE2 and is excluded by contract
  // (verified: injecting U+000B into a fragment fails the gate with a
  // one-space-vs-two diff, exactly the divergence class this hunts).

  private[graft] val HtmlFuzzFrags: Seq[String] = Seq(
    "<div class=\"x\">alpha beta</div> ",
    "<SCRIPT>var a=\"</div>\"; if (1<2 && x>3) go();</SCRIPT>gamma ",
    "<script type=\"t j\">maybe unterminated block ",
    "</p><p >delta epsilon ",
    "&amp;amp;zeta&amp;lt;x&amp;gt; ",
    "&lt;notatag&gt; &quot;qq&quot; &#39;aa&#39; ",
    "<style>.c{color:#f00} </style>eta ",
    "<br/><hr />theta ",
    "<a href=\"u?a=1&amp;b=2\">link iota</a> ",
    "plain kappa lambda ",
    "<![CDATA[ raw <x> ]]>mu ",
    "<!-- comment <b>bold</b> -->nu ",
    "&nbsp;&nbsp;xi&#39;s ",
    "<p style=\"a>b\">tricky omicron</p> ",
    "pi\n\trho  sigma ",
    "<td><tr>nested tau<td></tr> ",
    "&gt;&gt;&amp;&amp;&lt; upsilon ",
    "<script src=\"x.js\"></script>phi ",
    "<style >s{}</style ><b>chi</b> ",
    "psi<>omega ",
    "<img alt=\"a<b\">one two ",
    "&#39;&quot;&amp;#39; three ",
    "caf\u00e9 \u6c49\u5b57 four<wbr>five ",
    "<div\nclass=\"m\">six seven</div>")

  private[graft] val SentenceFuzzFrags: Seq[String] = Seq(
    "Dr. Smith went home. ",
    "Pi is 3.14159 exactly. ",
    "What?! Really now? ",
    "He said \"Stop.\" Then left. ",
    "(See fig. 2.) Next one! ",
    "End with dots... and go on. ",
    "no terminal tail fragment ",
    "Multi  spaces.  Double gap. ",
    "A.B.C. initials here. ",
    "Newline\nbreak. After newline. ",
    "Question? \"Quoted start.\" ",
    "Bracket close.] Outside now. ",
    "Paren close.) Right here. ",
    "Single quote end.' Next bit. ",
    "Tab\tafter. Tab sentence. ",
    "Trailing spaces.   ",
    "!Leading bang here. ",
    "Mixed?! ?Odd start. ",
    "x.y.z url-like.com here. ",
    "Short. S. ")

  // r11 second fuzz pass: the remaining three regex-subset text ops.
  // Answer normalization: \p{Punct} vs [[:punct:]] (ASCII-identical in
  // both engines), \b article boundaries incl. digit-adjacent and
  // punct-created boundaries, \s+ collapse over tabs/newlines.
  private[graft] val NormFuzzFrags: Seq[String] = Seq(
    "The Quick A Fox ",
    "an ANTHEM another thane ", // embedded articles must survive \b
    "it's don't o'clock ",
    "semi;colon: comma, dots... ",
    "(paren) [brack] {brace} <angle> ",
    "hy-phen under_score slash/ ",
    "3.14 1,000 #tag @user ",
    "the3 a1 an0 ", // digit-adjacent: no \b boundary, must survive
    "A AN THE MiXeD ",
    "!!bang?? **stars** ",
    "  multi   spaces\tand\ttabs ",
    "line\nbreaks\nhere ",
    "trailing article the",
    "a",
    "quotes \"dq\" 'sq' `tick` ",
    "THE-END a-b-c the_end ", // punct strip CREATES article boundaries
    "percent% caret^ pipe| tilde~ ",
    "x ")

  // Script-mix profile: first/last codepoints of every ScriptClasses
  // range plus the codepoints JUST OUTSIDE each boundary -- the off-by-one
  // class-membership traps -- and multi-script soup lines. (All \\uXXXX
  // escapes: raw non-ASCII in source is forbidden by convention.)
  private[graft] val ScriptFuzzFrags: Seq[String] = Seq(
    "Az latin edges ",
    "\u0400\u04FF cyrillic edges ",
    "\u03FF\u0500 outside cyrillic ",
    "\u0600\u06FF arabic edges ",
    "\u05FF\u0700 outside arabic ",
    "\u4E00\u9FFF cjk edges ",
    "\u4DFF\uA000 outside cjk ",
    "\u3040\u30FF kana edges ",
    "\u303F\u3100 outside kana ",
    "\uAC00\uD7AF hangul edges ",
    "\uABFF\uD7B0 outside hangul ",
    "0099 digit edges ",
    "@[`{ punct not latin ",
    "\u0410\u0431\u0412\u0433 ",
    "\u0627\u0644\u0639\u0631 ",
    "\u6C49\u5B57\u308A\uAC00 ",
    "mixed \u0410 a \u0627 1 \u6C49 ",
    "")

  // Mojibake detection: every MojibakeSeqs marker, lone prefixes that
  // must NOT count, clean lookalikes (a real e-acute), C1 boundary
  // codepoints (U+007F and U+00A0 are NOT C1), and overlap runs.
  private[graft] val MojibakeFuzzFrags: Seq[String] = Seq(
    "clean ascii text ",
    "\u00C3\u00A9 artifact pair ",
    "\u00C3\u00A8\u00C3\u00BC two pairs ",
    "\u00C3\u00A4\u00C3\u00B6 umlaut pairs ",
    "\u00E2\u20AC\u2122 smart apostrophe ",
    "\u00E2\u20AC\u0153 smart quote ",
    "\uFFFD lone replacement ",
    "\uFFFD\uFFFD double replacement ",
    "\u0080\u0085\u0092\u009F c1 members ",
    "\u007F\u00A0 c1 boundary NON-members ",
    "\u00E9 real e-acute stays clean ",
    "\u00C3 lone prefix no pair ",
    "\u00E2\u20AC lone two-char prefix ",
    "run \u00C3\u00A9\u00C3\u00A9\u00C3\u00A9 thrice ",
    "normal words again ")

  /** Confusable-skeleton fuzz fragments: homoglyph shapes that stress
    * the translate agreement between engines — Cyrillic/Greek lookalike
    * runs, fullwidth ASCII, zero-width members sitting INSIDE words and
    * at fragment boundaries, non-confusable Unicode that must pass
    * through untouched (accented Latin, CJK), and chars adjacent to the
    * mapped ranges that must NOT map.
    */
  private[graft] val ConfusableFuzzFrags: Seq[String] = Seq(
    "plain ascii stays ",
    "\u0440\u0430y\u0440\u0430l \u0430l\u0435rt ",
    "\u0397\u0435ll\u03BF w\u03BFrld ",
    "\uFF30\uFF21\uFF39 \uFF4E\uFF4F\uFF57 \uFF19\uFF19 ",
    "free\u200Bmoney\u200Chere ",
    "x\u2060y\uFEFFz\u200D ",
    "caf\u00E9 \u00FCmlaut stays ",
    "\u4E2D\u6587 passes through ",
    "\u0455\u0441\u0430m \u0455\u0456t\u0435 ",
    "\u0391\u0392\u0395\u0396\u0397\u0399\u039A\u039C upper greek ",
    "\u0410\u0412\u0415\u041A\u041C\u041D\u041E upper cyrillic ",
    "\u0436\u0449 unmapped cyrillic stays ",
    "\u03C9\u03C6 unmapped greek stays ",
    "\uFF0A\uFF5F fullwidth NON-alnum stays ",
    "\u200B\u200B double zero-width ")

  /** Robots-decision gate rule set — shared between the Spark gate and
    * the generated oracle VALUES so they cannot drift. d0-d9 carry the
    * '*' group (disallow /admin overridden by the longer allow
    * /admin/tools), d0-d4 ADDITIONALLY carry a graftbot-specific group
    * (which must REPLACE '*' entirely), d6 carries an allow /admin that
    * ties the disallow /admin exactly (allow must win the tie).
    *
    * r16 (typed politeness): crawl-delay rows ride the same relation —
    * d0/d1 in the graftbot group (used), d2-d8 in '*' (d2-d4's are DEAD:
    * the specific group exists without a delay line, so exclusivity
    * yields NO delay; d7's value is non-numeric and must drop).
    */
  private[graft] val RobotsRules: Seq[(String, String, String, String)] =
    (0 until 10).flatMap(k =>
      Seq(
        (s"d$k.com", "*", "disallow", "/admin"),
        (s"d$k.com", "*", "allow", "/admin/tools"))) ++
      (0 until 5).map(k =>
        (s"d$k.com", "graftbot", "disallow", "/admin/tools")) ++
      Seq(
        ("d6.com", "*", "allow", "/admin"),
        ("d0.com", "graftbot", "crawl-delay", "0.25"),
        ("d1.com", "graftbot", "crawl-delay", "3"),
        ("d2.com", "*", "crawl-delay", "2.5"),
        ("d3.com", "*", "crawl-delay", "4"),
        ("d4.com", "*", "crawl-delay", "6.75"),
        ("d5.com", "*", "crawl-delay", "1"),
        ("d6.com", "*", "crawl-delay", "0.5"),
        ("d7.com", "*", "crawl-delay", "fast"),
        ("d8.com", "*", "crawl-delay", "10"))

  /** Card-candidate fuzz fragments: digit-run shapes that stress the
    * leftmost-greedy `\d{13,19}` agreement between Java regex and RE2 —
    * over-length runs that must split 19+rest, runs crossing two real
    * card numbers (the documented false-negative), separator-broken
    * runs, boundary lengths 12/13/19/20, an all-zero "valid" checksum,
    * and known valid/invalid checksums.
    */
  private val CardFuzzFrags: Seq[String] = Seq(
    "pay 4111111111111111 ok ",
    "bad 4111111111111112 no ",
    "amex 378282246310005 yes ",
    "twenty 41111111111111112222 digits ",
    "thirty 123456789012345678901234567890 digits ",
    "fused 4111111111111111378282246310005 cards ",
    "nines 9999999999999999999 run ",
    "zeros 00000000000000 all ",
    "dashes 5555-5555-5555-4444 broken ",
    "twelve 411111111111 short ",
    "thirteen 1234567890123 edge ",
    "no digits at all here ",
    "snug x6011111111111117y tight ")

  private val FuzzDocs = 1000L

  /** Five fragment selectors (multiplier, offset) -- coprime multipliers so
    * the 1000 docs cover the fragment cross-product densely.
    */
  private val FuzzSelectors: Seq[(Int, Int)] =
    Seq((1, 0), (3, 1), (7, 2), (11, 3), (13, 5))

  /** Render a Scala string as a DuckDB expression producing the identical
    * byte sequence: printable-ASCII runs as quoted literals ('' escapes the
    * quote), everything else -- tabs, newlines, form feeds, non-ASCII -- as
    * chr(n). Neither engine gets a chance to re-interpret escapes.
    */
  private def duckLit(str: String): String = {
    if (str.isEmpty) return "''"
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val run = new java.lang.StringBuilder
    def flush(): Unit =
      if (run.length > 0) { parts += "'" + run.toString + "'"; run.setLength(0) }
    str.foreach { c =>
      if (c >= 0x20 && c <= 0x7e)
        run.append(if (c == '\'') "''" else c.toString)
      else { flush(); parts += s"chr(${c.toInt})" }
    }
    flush()
    parts.mkString(" || ")
  }

  /** The generated fuzz corpus, Spark side: doc i = concat of the five
    * selected fragments. Pure per-row expressions over a range -- no reads,
    * no shuffle.
    */
  private def fuzzDocsDf(s: SparkSession, frags: Seq[String]): DataFrame = {
    val n = frags.length
    val arr = array(frags.map(lit): _*)
    def pick(m: Int, a: Int) =
      element_at(
        arr,
        (((col("doc_id") * m + a) % n) + 1).cast(IntegerType))
    graft.ops.Par.fan(s.range(0, FuzzDocs).select(col("id").as("doc_id")))
      .withColumn(
        "txt",
        concat(FuzzSelectors.map { case (m, a) => pick(m, a) }: _*))
  }

  /** The same corpus as DuckDB CTEs (`docs(doc_id, txt)`), generated from
    * the same constants.
    */
  private def fuzzDocsSql(frags: Seq[String]): String = {
    val n = frags.length
    val lits = frags.map(duckLit).mkString("[", ", ", "]")
    val picks = FuzzSelectors
      .map { case (m, a) => s"fr[((i*$m+$a) % $n)+1]" }
      .mkString(" || ")
    s"""f(fr) AS (SELECT $lits),
       |ids AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, $FuzzDocs)),
       |docs AS (SELECT i AS doc_id, $picks AS txt FROM ids, f)""".stripMargin
  }

  /** Stratified-sampling gate rates (per-mille by lang), shared between the
    * Spark query and the generated oracle CASE so they cannot drift.
    * ListMap: deterministic iteration for stable SQL generation.
    */
  private val StratifiedRates: scala.collection.immutable.ListMap[String, Int] =
    scala.collection.immutable.ListMap("en" -> 100, "zh" -> 500)
  private val StratifiedDefault: Int = 250

  /** Corpus-mixing gate weights (per-mille by lang): en downsampled, zh
    * upsampled 2.5x, everything else kept 1x. Shared between the Spark query
    * and the generated oracle CASE so they cannot drift.
    */
  private val MixWeights: scala.collection.immutable.ListMap[String, Int] =
    scala.collection.immutable.ListMap("en" -> 300, "zh" -> 2500)
  private val MixDefault: Int = 1000

  /** DuckDB: double-fold dot product of two float-list columns (same index
    * order and double math as the Spark side's `DotProductF`).
    */
  private def embDotSql(x: String, y: String): String =
    s"list_reduce(list_transform(range(1, len($x) + 1), " +
      s"i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)), (acc, v) -> acc + v)"

  /** DuckDB: replay of the seeded random-hyperplane bucket
    * (`Similarity.lshBucket`): sign(p, i) = ±1 from hash61("plane<p>:<i>")
    * & 1; bit p set when the signed projection folds positive (same index
    * order, double math).
    */
  private def embBucketSql(v: String, planes: Int): String = {
    def bitSql(p: Int) = {
      val sign = s"(CASE WHEN (${hash61Sql(s"'plane$p:' || CAST(i AS VARCHAR)")} & 1) = 1 " +
        "THEN 1.0 ELSE -1.0 END)"
      s"(CASE WHEN list_reduce(list_transform(range(1, len($v) + 1), " +
        s"i -> CAST($v[i] AS DOUBLE) * $sign), (acc, x) -> acc + x) > 0 " +
        s"THEN ${1L << p} ELSE 0 END)"
    }
    (0 until planes).map(bitSql).mkString(" + ")
  }

  /** DuckDB CTE `emb_lsh(vec_id, embedding, n, bucket)`: embeddings with
    * norm and 2-plane LSH bucket — shared by the near-dup-pair and
    * semantic-dedup oracles.
    */
  private def embedNearDupCte: String =
    s"""emb_lsh AS (
       |  SELECT vec_id, embedding,
       |    sqrt(${embDotSql("embedding", "embedding")}) AS n,
       |    ${embBucketSql("embedding", 2)} AS bucket
       |  FROM embeddings)""".stripMargin

  /** DuckDB CTE chain replaying the minhash-LSH pair pipeline, ending in a
    * `verified(id_a, id_b, i, u)` relation — shared by the p_minhash_lsh
    * oracle and the clustering oracle built on its pair graph. Generated
    * from the same Scala constants as the Spark side so they cannot drift.
    */
  private def minhashPairCtes: String =
    minhashPairCtesFor(hashedShinglesSql(WsSql))

  /** The banded-minhash pair replay, parameterized on the hashed-shingle
    * expression (word shingles for p_minhash_lsh, char shingles for
    * p_char_minhash) and the band/row split of the 16 permutations
    * (4×4 for the near-dup gates; 2×8 for the deliberately-coarse
    * p_lsh_recall audit config) — one generator, all three gates.
    */
  private def minhashPairCtesFor(
      shExpr: String, bands: Int = 4, rows: Int = 4): String = {
    val a = listLit(Dedup.MinhashA)
    val b = listLit(Dedup.MinhashB)
    val p = Dedup.MinhashP
    require(bands * rows == 16, "bands*rows must cover the 16 permutations")
    val bandKey = (1 to rows)
      .map(r => s"CAST(sig[bi*$rows+$r] AS VARCHAR)")
      .mkString(" || '-' || ")
    s"""d AS (
       |  SELECT doc_id, $shExpr AS sh FROM documents),
       |h AS (
       |  SELECT doc_id, sh, sh AS hs FROM d),
       |sig AS (
       |  SELECT doc_id, sh,
       |    list_transform(range(0, 16), k ->
       |      coalesce(list_min(list_transform(hs,
       |        x -> ($a[k+1] * (x % $p) + $b[k+1]) % $p)), $p)) AS sig
       |  FROM h WHERE len(hs) > 0),
       |banded AS (
       |  SELECT doc_id, sh,
       |    unnest(range(0, $bands)) AS band,
       |    unnest(list_transform(range(0, $bands), bi -> $bandKey))
       |      AS band_key
       |  FROM sig),
       |cand AS (
       |  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
       |  FROM banded l JOIN banded r
       |    ON l.band = r.band AND l.band_key = r.band_key
       |   AND l.doc_id < r.doc_id),
       |verified AS (
       |  SELECT c.id_a, c.id_b,
       |    len(list_intersect(da.sh, db.sh)) AS i,
       |    len(da.sh) + len(db.sh) - len(list_intersect(da.sh, db.sh)) AS u
       |  FROM cand c
       |  JOIN d da ON da.doc_id = c.id_a
       |  JOIN d db ON db.doc_id = c.id_b)""".stripMargin
  }

  /** Cross-corpus variant of [[minhashPairCtes]]: banded signatures built
    * separately for the `newPred` and `seenPred` slices of documents, the
    * candidate join ACROSS them (no `<` — ids come from different corpora),
    * yielding `verified(id_a, id_b, i, u)` with id_a from the new slice.
    * Same Scala constants as the Spark side so they cannot drift.
    */
  private def minhashCrossCtes(newPred: String, seenPred: String): String = {
    val a = listLit(Dedup.MinhashA)
    val b = listLit(Dedup.MinhashB)
    val p = Dedup.MinhashP
    def corpus(s: String, pred: String) =
      s"""d$s AS (
         |  SELECT doc_id, ${hashedShinglesSql(WsSql)} AS sh
         |  FROM documents WHERE $pred),
         |sig$s AS (
         |  SELECT doc_id,
         |    list_transform(range(0, 16), k ->
         |      coalesce(list_min(list_transform(sh,
         |        x -> ($a[k+1] * (x % $p) + $b[k+1]) % $p)), $p)) AS sig
         |  FROM d$s WHERE len(sh) > 0),
         |banded$s AS (
         |  SELECT doc_id,
         |    unnest(range(0, 4)) AS band,
         |    unnest(list_transform(range(0, 4), bi ->
         |      CAST(sig[bi*4+1] AS VARCHAR) || '-' || CAST(sig[bi*4+2] AS VARCHAR) ||
         |      '-' || CAST(sig[bi*4+3] AS VARCHAR) || '-' || CAST(sig[bi*4+4] AS VARCHAR)))
         |      AS band_key
         |  FROM sig$s)""".stripMargin
    s"""${corpus("N", newPred)},
       |${corpus("S", seenPred)},
       |cand AS (
       |  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
       |  FROM bandedN l JOIN bandedS r
       |    ON l.band = r.band AND l.band_key = r.band_key),
       |verified AS (
       |  SELECT c.id_a, c.id_b,
       |    len(list_intersect(da.sh, db.sh)) AS i,
       |    len(da.sh) + len(db.sh) - len(list_intersect(da.sh, db.sh)) AS u
       |  FROM cand c
       |  JOIN dN da ON da.doc_id = c.id_a
       |  JOIN dS db ON db.doc_id = c.id_b)""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ----- exact dedup by content hash -----
    "p_exact_dedup" -> { (s, dir) =>
      Dedup.exact(t(s, dir, "documents"), "doc_id", "text")
    },

    // ----- priority exact dedup (NEW r10): keep the copy with the BEST
    // provenance score (crawl quality, freshness), not the minimum id —
    // deterministic per-id hash scores so the duplicate copies genuinely
    // compete; argmax = partial-agg'd min(struct(-score, id)) -----
    "p_dedup_keep_best" -> { (s, dir) =>
      Dedup.exactKeepBest(
        t(s, dir, "documents"),
        "doc_id",
        "text",
        TextFunctions.hash61(
          concat(lit("prio:"), col("doc_id").cast(StringType))) % 1000)
    },

    // ----- exact n-gram jaccard near-dup pairs within (lang, source) -----
    "p_ngram_jaccard" -> { (s, dir) =>
      Dedup.ngramJaccardPairs(
        t(s, dir, "documents"),
        "doc_id",
        "text",
        Seq("lang", "source"),
        n = 3,
        threshold = 0.5)
    },

    // ----- minhash + banded LSH near-dup, jaccard-verified -----
    "p_minhash_lsh" -> { (s, dir) =>
      Dedup.minhashLshPairs(
        t(s, dir, "documents"),
        "doc_id",
        "text",
        n = 3,
        bands = 4,
        threshold = 0.5)
    },

    // ----- char-shingle MinHash+LSH (NEW r11): the near-dup variant for
    // UNSEGMENTED text — the fixture strips every space, so word shingles
    // would degenerate to whole lines; 5-char shingles at jaccard >= 0.6
    // over the same fixed permutations -----
    "p_char_minhash" -> { (s, dir) =>
      Dedup.minhashLshPairsChars(
        t(s, dir, "documents")
          .select(
            col("doc_id"),
            regexp_replace(col("text"), "\\s+", "").as("txt")),
        "doc_id",
        "txt",
        n = 5,
        bands = 4,
        threshold = 0.6)
    },

    // ----- MinHash estimator-accuracy audit (NEW r11): per LSH candidate
    // pair, signature-agreement estimate vs exact jaccard — audits the
    // ESTIMATE (Broder's E[agree/k] = J) where p_lsh_recall audits the
    // BANDING; the report read before acting on estimated similarity
    // without exact verification -----
    "p_minhash_estimate" -> { (s, dir) =>
      Dedup.minhashEstimateReport(
        t(s, dir, "documents"), "doc_id", "text", n = 3, bands = 4)
    },

    // ----- LSH-config recall audit (NEW r11): how many TRUE jaccard>=0.5
    // pairs does a banded-MinHash config actually surface? Truth = the
    // lossless prefix-filter exact join; found = the LSH pairs under a
    // DELIBERATELY coarse 2-band x 8-row split of the 16 permutations,
    // where the S-curve genuinely drops borderline pairs (collision
    // probability 1-(1-j^8)^2) — so the gate pins a non-trivial
    // n_missed > 0, the number a dedup run reports before trusting a
    // config at 100 TB -----
    "p_lsh_recall" -> { (s, dir) =>
      Dedup.lshRecallReport(
        t(s, dir, "documents"), "doc_id", "text",
        n = 3, bands = 2, threshold = 0.5)
    },

    // ----- EXACT prefix-filter similarity join (lossless, no LSH recall
    // loss) — candidates from a rarest-first prefix inverted index -----
    "p_prefix_jaccard" -> { (s, dir) =>
      Dedup.prefixJaccardPairs(
        t(s, dir, "documents"),
        "doc_id",
        "text",
        n = 3,
        threshold = 0.5)
    },

    // ----- exact edit-distance similarity join (NEW r11): FastSS
    // deletion-neighborhood candidates + levenshtein verify over a short
    // derived title field — the typo-radius dedup signal n-gram overlap
    // misses. Fixture plants distance-1 partners (every 7th doc's title
    // grows one char); exact-collapse front first (reps = min id per
    // title), the scaladoc'd at-scale composition. Gated against the
    // NAIVE all-pairs levenshtein oracle = losslessness proof -----
    "p_edit_pairs" -> { (s, dir) =>
      val titled = t(s, dir, "documents").select(
        col("doc_id"),
        concat(
          substring(col("text"), 1, 12),
          when(col("doc_id") % 7 === 0, lit("x")).otherwise(lit("")))
          .as("title"))
      val reps = titled
        .groupBy(col("title"))
        .agg(min(col("doc_id")).as("doc_id"))
      Dedup.editDistancePairs(reps, "doc_id", col("title"), maxDist = 1)
    },

    // ----- exact n-gram CONTAINMENT join (NEW r10): directional
    // doc-in-doc detection — |S(A)∩S(B)|/|S(A)| ≥ 0.5; catches excerpts
    // and quoted bodies that jaccard misses by construction. Gated against
    // the NAIVE all-pairs oracle = losslessness proof, like
    // p_prefix_jaccard -----
    "p_containment" -> { (s, dir) =>
      Dedup.containmentPairs(
        t(s, dir, "documents"),
        "doc_id",
        "text",
        n = 3,
        thresholdPpm = 500000L)
    },

    // ----- corpus snapshot diff (NEW r10): incremental-crawl accounting —
    // which ids were added/removed/changed/unchanged between two dumps
    // (re-embed only changed+added, retire removed). Fixture: drop every
    // 7th, bump every 5th's content, add a shifted copy of every 13th -----
    "p_snapshot_diff" -> { (s, dir) =>
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      Dedup.snapshotDiff(docs, refreshedSnapshot(docs), "doc_id", "text")
    },

    // ----- incremental-refresh COMPOSITION (NEW r10): the chain a
    // recurring crawl actually runs over a new dump — snapshot diff →
    // process ONLY added+changed → HTML strip → NFC canonicalize →
    // code-routing filter → priority keep-best dedup. Six r10 operators
    // composed end-to-end against one chained oracle -----
    "p_refresh_e2e" -> { (s, dir) =>
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val newDf = refreshedSnapshot(docs)
      val todo = Dedup.snapshotDiff(docs, newDf, "doc_id", "text")
        .filter(col("status").isin("added", "changed"))
        .select(col("doc_id"))
      val fresh = newDf.join(todo, "doc_id")
      val html = concat(
        lit("<html><body><p>"),
        col("text"),
        lit(" &amp; tail</p><script>var x = 1;</script></body></html>"))
      val cleaned = fresh.select(
        col("doc_id"),
        TextFunctions.nfcNormalize(TextFunctions.stripHtml(html)).as("clean"))
      val prose = cleaned.filter(!TextFunctions.isCode(col("clean")))
      Dedup.exactKeepBest(
        prose,
        "doc_id",
        "clean",
        TextFunctions.hash61(
          concat(lit("prio:"), col("doc_id").cast(StringType))) % 1000)
    },

    // ----- near-dup clusters (connected components over the pair graph) --
    "p_dup_clusters" -> { (s, dir) =>
      Dedup.nearDupClusters(
        Dedup.minhashLshPairs(
          t(s, dir, "documents"), "doc_id", "text",
          n = 3, bands = 4, threshold = 0.5))
    },

    // ----- duplication-structure audit (NEW r10): near-dup cluster-size
    // histogram — how many clusters of 2, 3, … docs the corpus carries
    // (the "how duplicated are we" number a dedup run reports before
    // deciding keep-one vs keep-best). Composition: LSH pairs → CC →
    // per-cluster size → per-size count; singletons (docs in no pair)
    // are by definition absent -----
    "p_cluster_sizes" -> { (s, dir) =>
      Dedup.nearDupClusters(
        Dedup.minhashLshPairs(
          t(s, dir, "documents"), "doc_id", "text",
          n = 3, bands = 4, threshold = 0.5))
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("__sz"))
        .groupBy(col("__sz").as("cluster_size"))
        .agg(
          count(lit(1)).as("n_clusters"),
          sum(col("__sz")).as("n_docs"))
    },

    // ----- star-contraction connected components (NEW r10): the
    // O(log n)-round CC for ARBITRARY-diameter pair graphs. The fixture is
    // the case min-label propagation cannot handle in bounded rounds:
    // 100-long doc-id chains (diameter 99 — propagation's default 20
    // rounds would NOT converge) plus hub edges merging every 10th block,
    // so components mix long paths and stars. cluster_id = component min,
    // gated hash-exact against the recursive-closure oracle -----
    "p_cc_star" -> { (s, dir) =>
      val docs = tRaw(s, dir, "documents").select(col("doc_id"))
      val chain = docs
        .filter(col("doc_id") % 100 =!= 99)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
      val hubs = docs
        .filter(col("doc_id") % 1000 === 0 && col("doc_id") =!= 0)
        .select(col("doc_id").as("id_a"), lit(0L).as("id_b"))
      graft.ops.ConnectedComponents.components(chain.union(hubs))
    },

    // ----- end-to-end near-dup removal: pairs → clusters → keep-one -----
    "p_dedup_survivors" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      Dedup
        .keepOnePerCluster(
          docs,
          "doc_id",
          Dedup.minhashLshPairs(
            docs, "doc_id", "text", n = 3, bands = 4, threshold = 0.5))
        .select(col("doc_id"), col("lang"), col("source"))
    },
    "p_dedup_survivors_fast" -> { (s, dir) =>
      Dedup
        .nearDupSurvivors(
          t(s, dir, "documents"), "doc_id", "text",
          n = 3, bands = 4, threshold = 0.5)
        .select(col("doc_id"), col("lang"), col("source"))
    },

    // ----- trained bigram-LM fluency scoring -----
    "t_bigram_fluency" -> { (s, dir) =>
      graft.ops.NgramLm.bigramFluency(
        t(s, dir, "documents"), "doc_id", "text")
    },

    // ----- TF-IDF distinctiveness scoring + keyword extraction -----
    "t_tfidf" -> { (s, dir) =>
      graft.ops.TfIdf.scoreDocs(t(s, dir, "documents"), "doc_id", "text")
    },
    "t_keywords" -> { (s, dir) =>
      graft.ops.TfIdf.topKeywords(
        t(s, dir, "documents"), "doc_id", "text", k = 3)
    },

    // ----- positional posting lists (NEW r11): the materialized
    // inverted-index artifact — (term, doc, tf, first occurrence, df) -----
    "t_postings" -> { (s, dir) =>
      graft.ops.TfIdf.postings(t(s, dir, "documents"), "doc_id", "text")
    },

    // ----- exact phrase search (NEW r11): consecutive-word matches via
    // the positional machinery — the corpus contains a doc with TWO
    // matches, so n_matches > 1 is exercised -----
    "t_phrase_search" -> { (s, dir) =>
      graft.ops.TfIdf.phraseMatches(
        t(s, dir, "documents"), "doc_id", "text", Seq("table", "value"))
    },

    // ----- BM25-style keyword retrieval (rational idf, bit-exact) -----
    "t_bm25_topk" -> { (s, dir) =>
      graft.ops.Bm25.searchTopK(
        t(s, dir, "documents"),
        "doc_id",
        "text",
        query = Seq("spark", "join", "vector"),
        k = 200)
    },

    // ----- per-doc n-gram novelty (NEW r11): how much of each odd doc's
    // distinct 3-gram mass already exists in the even half (the "seen"
    // reference) — the memorization/novelty feature reported for
    // generated or newly-crawled data; planted exact dups score 0 and
    // genuinely-new docs 1e6, with partial overlap in between -----
    "t_novelty" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      graft.ops.Decontaminate.noveltyReport(
        docs.filter(col("doc_id") % 2 === 1),
        "doc_id",
        col("text"),
        docs.filter(col("doc_id") % 2 === 0),
        col("text"),
        n = 3)
    },

    // ----- redirect-chain resolution (NEW r11): pointer-doubling to each
    // src's terminal URL with exact hop counts — chains of length up to
    // 99 (docs link doc_id -> doc_id-1, heads at %100==0) against a
    // maxHops=16 cap, so both resolved (hops<=16) and capped/unresolved
    // rows appear; a 3-node literal cycle pins the cycle verdict; every
    // %50 doc carries a SECOND out-edge that min-collapse must drop -----
    "u_redirects" -> { (s, dir) =>
      val docs = tRaw(s, dir, "documents").select(col("doc_id"))
      val u = (x: Column) => concat(lit("u"), x.cast(StringType))
      val e1 = docs.filter(col("doc_id") % 100 =!= 0)
        .select(u(col("doc_id")).as("src"), u(col("doc_id") - 1).as("dst"))
      val e2 = docs.filter(col("doc_id") % 50 === 0 && col("doc_id") % 100 =!= 0)
        .select(
          u(col("doc_id")).as("src"),
          concat(lit("z"), col("doc_id").cast(StringType)).as("dst"))
      import s.implicits._
      val e3 = Seq(
        ("cycA", "cycB"), ("cycB", "cycC"), ("cycC", "cycA"))
        .toDF("src", "dst")
      graft.ops.Urls.resolveRedirects(
        e1.union(e2).union(e3), "src", "dst", maxHops = 16)
    },

    // ----- Luhn-validated payment-card audit (NEW r11): bare \d{13,19}
    // PII regexes flag order ids/timestamps/hashes as cards; the ISO 7812
    // checksum kills ~90% of that false-positive class. Fixture plants a
    // valid Visa test number (doc%3=0), a one-digit-off INVALID twin
    // (doc%3=1 — same regex hit, fails the checksum), a too-short run
    // (doc%3=2 — not a candidate), and a second valid Amex on doc%5=0 --
    "t_card_audit" -> { (s, dir) =>
      val d = col("doc_id")
      val planted = concat(
        col("text"), lit(" pay "),
        when(d % 3 === 0, lit("4111111111111111"))
          .when(d % 3 === 1, lit("4111111111111112"))
          .otherwise(lit("12345678")),
        when(d % 5 === 0, lit(" 378282246310005")).otherwise(lit("")),
        lit(" end"))
      val audit = TextFunctions.cardAudit(planted)
      t(s, dir, "documents").select(
        d,
        audit.getField("n_candidates").as("n_candidates"),
        audit.getField("n_luhn_valid").as("n_luhn_valid"))
    },

    // ----- largest-remainder apportionment (NEW r11): split EXACTLY 1000
    // slots across languages proportional to their char mass — the
    // per-group exact-total complement to the P75 rate planner (floors
    // under-allocate; the remainder ranking tops up, Σ n_alloc = 1000) --
    "t_apportion" -> { (s, dir) =>
      Sampling.apportion(
        t(s, dir, "documents")
          .select(
            col("lang"),
            coalesce(length(col("text")), lit(0)).as("w")),
        "lang", col("w"), total = 1000L)
    },

    // ----- rendezvous (highest-random-weight) sharding (NEW r11): the
    // minimal-movement assignment for incremental pipelines — and its
    // movement audit on a 5->6 worker resize, where ~1/6 of rows move
    // (id % k would reshuffle nearly everything) -----
    "t_rendezvous" -> { (s, dir) =>
      graft.ops.Packing.rendezvousAssign(
        t(s, dir, "documents").select(col("doc_id")),
        "doc_id",
        workers = Seq("w0", "w1", "w2", "w3", "w4"))
    },
    "t_rendezvous_moves" -> { (s, dir) =>
      graft.ops.Packing.rendezvousMoveReport(
        t(s, dir, "documents").select(col("doc_id")),
        "doc_id",
        before = Seq("w0", "w1", "w2", "w3", "w4"),
        after = Seq("w0", "w1", "w2", "w3", "w4", "w5"))
    },

    // ----- NDCG@k for GRADED relevance (NEW r11): credits putting HIGHLY
    // relevant docs first where MRR/MAP treat all rels alike. The 1/log2
    // discount is a FROZEN ppm constant table (RankEval.DiscountPpm,
    // StrictMath at class load) shared verbatim with the oracle — the
    // metric arithmetic itself stays exact-integer. Same 20-bucket run
    // fixture as t_rank_eval; grades 1..3 hash-derived -----
    "t_ndcg" -> { (s, dir) =>
      val docs = tRaw(s, dir, "documents").select(col("doc_id"))
      val qrels = docs
        .filter(
          TextFunctions.hash61(
            concat(lit("rel:"), col("doc_id").cast(StringType))) % 5 === 0)
        .select(
          (col("doc_id") % 20).as("query_id"),
          col("doc_id").as("d"),
          (TextFunctions.hash61(
            concat(lit("grade:"), col("doc_id").cast(StringType))) % 3 + 1)
            .as("rel"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("__s").desc, col("d"))
      val run = docs
        .select(
          (col("doc_id") % 20).as("query_id"),
          col("doc_id").as("d"),
          TextFunctions.hash61(
            concat(lit("score:"), col("doc_id").cast(StringType))).as("__s"))
        .withColumn("rank", row_number().over(w).cast(LongType))
        .drop("__s")
      graft.ops.RankEval.ndcgPerQuery(
        run, qrels, "query_id", "d", "rank", "rel", k = 10)
    },

    // ----- rank-aware retrieval eval (NEW r11): MRR / integer-AP / hit@k
    // of a ranked run vs binary qrels — WHERE the relevant docs rank, not
    // just whether they appear (P80 recall@k). Fixture: 20 query buckets
    // (doc_id % 20), run = per-bucket hash-scored ranking truncated at
    // k=10, qrels = every hash-5th doc — so some relevants rank high,
    // some low, some miss the cutoff entirely and every metric is
    // non-trivial -----
    "t_rank_eval" -> { (s, dir) =>
      val docs = tRaw(s, dir, "documents").select(col("doc_id"))
      val qrels = docs
        .filter(
          TextFunctions.hash61(
            concat(lit("rel:"), col("doc_id").cast(StringType))) % 5 === 0)
        .select((col("doc_id") % 20).as("query_id"), col("doc_id").as("d"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("__s").desc, col("d"))
      val run = docs
        .select(
          (col("doc_id") % 20).as("query_id"),
          col("doc_id").as("d"),
          TextFunctions.hash61(
            concat(lit("score:"), col("doc_id").cast(StringType))).as("__s"))
        .withColumn("rank", row_number().over(w).cast(LongType))
        .drop("__s")
      graft.ops.RankEval.perQuery(
        run, qrels, "query_id", "d", "rank", k = 10)
    },

    // ----- simhash signatures -----
    "p_simhash" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), Dedup.simhash(col("text")).as("simhash"))
    },

    // ----- winnowing fingerprints -----
    "p_winnow_fingerprint" -> { (s, dir) =>
      Dedup.winnowingFingerprints(
        t(s, dir, "documents"), "doc_id", "text", n = 3, w = 4)
    },

    // ----- token statistics -----
    "t_token_stats" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      d.select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        size(TextFunctions.wordSet(col("text"))).as("n_uniq_tokens"),
        TextFunctions.bpeTokenEstimate(col("text")).as("n_bpe_est"),
        TextFunctions.meanTokenLength(col("text")).as("mean_token_len"))
    },

    // ----- per-language corpus statistics / tokenizer fertility report
    // (subword-per-word and chars-per-token drive mixture + budget
    // decisions; exact integer sums are order-free so the report is
    // hash-gateable) -----
    "t_lang_fertility" -> { (s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text")).cast(LongType))
            .as("total_words"),
          sum(TextFunctions.bpeTokenEstimate(col("text"))).as("total_bpe_est"),
          sum(length(col("text")).cast(LongType)).as("total_chars"))
        .withColumn(
          "fertility",
          col("total_bpe_est").cast(DoubleType) /
            col("total_words").cast(DoubleType))
        .withColumn(
          "chars_per_token",
          col("total_chars").cast(DoubleType) /
            col("total_bpe_est").cast(DoubleType))
    },

    // ----- trained-BPE token counts with the FROZEN merge table (train
    // once, encode everywhere — the production shape; Bpe.Frozen provenance
    // pinned by BpeSpec). The DuckDB oracle replays the same table as a
    // boundary-delimited replace chain. -----
    "t_bpe_tokens" -> { (s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        graft.ops.Bpe.tokenCountOrdered(col("text"), graft.ops.Bpe.Frozen)
          .as("n_bpe_tokens"))
    },

    // ----- vocabulary pruning: drop the corpus-top-20 words per doc -----
    "t_stopword_prune" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      // distributed histogram (one partial-agg shuffle), deterministic ties,
      // top-20 collected and broadcast into the pruning expression
      val top = d
        .select(explode(TextFunctions.words(col("text"))).as("w"))
        .groupBy(col("w"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w").asc)
        .limit(20)
        .collect()
        .map(_.getString(0))
        .toSeq
      d.select(
        col("doc_id"),
        size(TextFunctions.words(col("text"))).as("n_tokens"),
        size(TextFunctions.pruneWords(col("text"), top)).as("n_kept"))
    },

    // ----- deterministic hash sampling (reproducible corpus subsetting) -----
    "t_hash_sample" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          (TextFunctions.hash61(col("doc_id").cast(StringType)) % 100)
            .as("bucket"))
        .filter(col("bucket") < 10)
    },

    // ----- stratified hash sampling (per-stratum reproducible rates) -----
    "t_stratified_sample" -> { (s, dir) =>
      graft.ops.Sampling.stratifiedHashSample(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "doc_id",
        "lang",
        StratifiedRates,
        StratifiedDefault)
    },

    // ----- contiguous pretraining-window layout: concat-order token
    // offsets + the exact 128-token windows each doc spans (docs cross
    // window boundaries — the causal-LM loader layout) -----
    "t_contig_windows" -> { (s, dir) =>
      graft.ops.Packing.contiguousWindows(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id",
        TextFunctions.tokenCount(col("text")),
        windowLen = 128L)
        .select(
          col("doc_id"), col("n_tokens"), col("tok_start"),
          col("first_window"), col("last_window"), col("offset_in_first"))
    },

    // ----- deterministic global shuffle (NEW r10): reproducible training-
    // order permutation — pos = rank by (hash61(seed:doc_id), doc_id),
    // shard = pos ⌊/⌋ 64 — via the no-global-sort rangePrefix machinery --
    "t_global_shuffle" -> { (s, dir) =>
      graft.ops.Packing.globalShuffle(
        t(s, dir, "documents").select(col("doc_id")),
        "doc_id", seed = "shuffle", shardSize = 64L)
    },

    // ----- deterministic k-fold assignment (NEW r11): exact per-stratum
    // balance — every (lang, fold) cell within one row of n_lang/5 -----
    "t_kfold" -> { (s, dir) =>
      graft.ops.Sampling.kFolds(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "doc_id",
        k = 5,
        strataCols = Seq("lang"))
    },

    // ----- Tukey IQR outlier filter (NEW r11): exact quantile_disc
    // fences [Q1 - 1.5*IQR, Q3 + 1.5*IQR] over a metric with planted
    // 50x outliers (every 97th doc) that must all fall outside -----
    "t_iqr_filter" -> { (s, dir) =>
      val metric = when(col("doc_id") % 97 === 0, col("n_chars") * 50)
        .otherwise(col("n_chars"))
      graft.ops.Sampling.iqrFilter(
        t(s, dir, "documents")
          .select(col("doc_id"), metric.as("metric")),
        "doc_id",
        col("metric"))
    },

    // ----- source-interleaved training order (NEW r11): the mixture
    // SCHEDULING step — fractional-progress merge over a skewed 70/20/10
    // source split, so every dataloader prefix carries the corpus
    // proportions by construction -----
    "t_interleave" -> { (s, dir) =>
      graft.ops.Packing.interleaveBySource(
        t(s, dir, "documents").select(
          col("doc_id"),
          when(col("doc_id") % 10 < 7, lit("s0"))
            .when(col("doc_id") % 10 < 9, lit("s1"))
            .otherwise(lit("s2")).as("source")),
        "doc_id",
        "source")
    },

    // ----- crawl-scope e2e composition (NEW r11): the frontier-scoping
    // flow a policy-bounded crawl runs — href extraction (P102) →
    // registered domains (P39) → BFS hop distance from the seed domains
    // (P110) → keep only docs whose domain is within 2 hops. The .com
    // targets cover only d0–d40, so d41+.com sources are genuinely out
    // of scope unless seeded — the fixture has a real frontier edge -----
    "u_crawl_scope" -> { (s, dir) =>
      val url1 = concat(
        lit("https://www.d"), (col("doc_id") % 37).cast(StringType),
        lit(".co.uk/p"), col("doc_id").cast(StringType))
      val url2 = concat(
        lit("http://blog.d"), (col("doc_id") % 41).cast(StringType),
        lit(".com/q?id="), col("doc_id").cast(StringType))
      val html = concat(
        lit("<p>"), col("text"), lit("</p><a href=\""), url1,
        lit("\">x</a> <nav><a href=\""), url2, lit("\">y</a></nav>"))
      val srcDom = concat(
        lit("d"), (col("doc_id") % 50).cast(StringType), lit(".com"))
      val docs = t(s, dir, "documents")
      val edges = docs
        .select(srcDom.as("src"), explode(Urls.extractLinks(html)).as("url"))
        .select(col("src"), Urls.urlDomain(col("url")).as("dst"))
      val seeds = s.range(3).select(
        concat(lit("d"), col("id").cast(StringType), lit(".com")).as("node"))
      val depths =
        graft.ops.Bfs.depths(edges, "src", "dst", seeds, "node", maxDepth = 2)
      docs
        .select(col("doc_id"), srcDom.as("domain"))
        .join(depths, col("domain") === col("node"))
        .select(col("doc_id"), col("domain"), col("depth"))
    },

    // ----- anchor-TEXT aggregation (NEW r11): per target domain, the
    // words used in anchors pointing AT it — the classic link-text
    // description signal. Whole <a> elements extract first so url and
    // text stay aligned; anchor texts derive from each doc's own words -----
    "u_anchor_text" -> { (s, dir) =>
      val url1 = concat(
        lit("https://www.d"), (col("doc_id") % 37).cast(StringType),
        lit(".co.uk/p"), col("doc_id").cast(StringType))
      val url2 = concat(
        lit("http://blog.d"), (col("doc_id") % 41).cast(StringType),
        lit(".com/q?id="), col("doc_id").cast(StringType))
      val html = concat(
        lit("<p>"), col("text"), lit("</p><a href=\""), url1, lit("\">"),
        substring(col("text"), 1, 20),
        lit("</a> <nav><a href=\""), url2, lit("\">more "),
        substring(col("text"), 21, 12), lit("</a></nav>"))
      t(s, dir, "documents")
        .select(explode(Urls.anchors(html)).as("a"))
        .select(
          Urls.urlDomain(col("a.url")).as("domain"),
          explode(TextFunctions.words(col("a.text"))).as("term"))
        .filter(col("term") =!= "")
        .groupBy(col("domain"), col("term"))
        .agg(count(lit(1)).as("n_mentions"))
    },

    // ----- link authority over REAL extracted anchors (NEW r10): the
    // full crawl-authority composition — href extraction (u_outlinks
    // fixture) → PSL-lite registered domains → integer-exact PageRank
    // over the (source domain, linked domain) multigraph -----
    "u_link_authority" -> { (s, dir) =>
      val url1 = concat(
        lit("https://www.d"), (col("doc_id") % 37).cast(StringType),
        lit(".co.uk/p"), col("doc_id").cast(StringType))
      val url2 = concat(
        lit("http://blog.d"), (col("doc_id") % 41).cast(StringType),
        lit(".com/q?id="), col("doc_id").cast(StringType))
      val html = concat(
        lit("<p>"), col("text"), lit("</p><a href=\""), url1,
        lit("\">x</a> <nav><a href=\""), url2, lit("\">y</a></nav>"))
      val srcDom = concat(
        lit("d"), (col("doc_id") % 50).cast(StringType), lit(".com"))
      val edges = t(s, dir, "documents")
        .select(
          srcDom.as("src"),
          explode(Urls.extractLinks(html)).as("url"))
        .select(col("src"), Urls.urlDomain(col("url")).as("dst"))
      graft.ops.PageRank.ranks(edges, "src", "dst", iters = 3)
    },

    // ----- crawl-depth BFS (NEW r11): min-hop distance from a seed list
    // over the same deterministic link graph — the frontier scheduler's
    // "how far from the seeds is this URL" signal. Exact integer layers,
    // early-exit on an exhausted frontier; oracle = a depth-bounded
    // recursive CTE -----
    "u_crawl_depth" -> { (s, dir) =>
      val docs = tRaw(s, dir, "documents").select(col("doc_id"))
      val n = docs.count()
      val e1 = docs.select(
        col("doc_id").as("src"), ((col("doc_id") * 7 + 3) % n).as("dst"))
      val e2 = docs.select(
        col("doc_id").as("src"), ((col("doc_id") * 13 + 5) % n).as("dst"))
      val e3 = docs.filter(col("doc_id") % 5 === 0).select(
        col("doc_id").as("src"), (col("doc_id") % 37).as("dst"))
      graft.ops.Bfs.depths(
        e1.union(e2).union(e3),
        "src",
        "dst",
        docs.filter(col("doc_id") % 97 === 0)
          .select(col("doc_id").as("node")),
        "node",
        maxDepth = 4)
    },

    // ----- link-graph authority scoring (integer-exact PageRank, 5
    // iterations) over a deterministic link graph derived from doc ids:
    // every doc links to two pseudo-random targets, every 5th doc also
    // links to one of 37 hub nodes (the authority set) -----
    "u_pagerank" -> { (s, dir) =>
      val docs = tRaw(s, dir, "documents").select(col("doc_id"))
      val n = docs.count()
      val e1 = docs.select(
        col("doc_id").as("src"), ((col("doc_id") * 7 + 3) % n).as("dst"))
      val e2 = docs.select(
        col("doc_id").as("src"), ((col("doc_id") * 13 + 5) % n).as("dst"))
      val e3 = docs.filter(col("doc_id") % 5 === 0).select(
        col("doc_id").as("src"), (col("doc_id") % 37).as("dst"))
      graft.ops.PageRank.ranks(
        e1.union(e2).union(e3), "src", "dst", iters = 5)
    },

    // ----- HITS hubs & authorities (NEW r11) over the SAME derived link
    // graph as u_pagerank: the 37 hub-targets should surface as the top
    // authorities and the every-5th linkers as hubs. Integer-exact
    // max-rescale iterations — hash-gateable like the PageRank family -----
    "u_hits" -> { (s, dir) =>
      val docs = tRaw(s, dir, "documents").select(col("doc_id"))
      val n = docs.count()
      val e1 = docs.select(
        col("doc_id").as("src"), ((col("doc_id") * 7 + 3) % n).as("dst"))
      val e2 = docs.select(
        col("doc_id").as("src"), ((col("doc_id") * 13 + 5) % n).as("dst"))
      val e3 = docs.filter(col("doc_id") % 5 === 0).select(
        col("doc_id").as("src"), (col("doc_id") % 37).as("dst"))
      graft.ops.Hits.ranks(
        e1.union(e2).union(e3), "src", "dst", iters = 5)
    },

    // ----- TrustRank / personalized PageRank (NEW r11): teleportation
    // returns mass ONLY to a trusted seed set (every 50th doc), so rank
    // measures link-proximity to trust — the spam-damping signal plain
    // PageRank lacks (link farms inflate global in-link mass but sit far
    // from seeds). Unreachable nodes get rank 0. Integer-exact -----
    "u_trustrank" -> { (s, dir) =>
      val docs = tRaw(s, dir, "documents").select(col("doc_id"))
      val n = docs.count()
      val e1 = docs.select(
        col("doc_id").as("src"), ((col("doc_id") * 7 + 3) % n).as("dst"))
      val e2 = docs.select(
        col("doc_id").as("src"), ((col("doc_id") * 13 + 5) % n).as("dst"))
      val e3 = docs.filter(col("doc_id") % 5 === 0).select(
        col("doc_id").as("src"), (col("doc_id") % 37).as("dst"))
      val seeds = docs
        .filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("node"))
      graft.ops.PageRank.personalizedRanks(
        e1.union(e2).union(e3), "src", "dst", seeds, "node", iters = 5)
    },

    // ----- degree-distribution audit (NEW r11) of the same link graph:
    // the structural pre-flight before PageRank/HITS/BFS — power-of-two
    // in/out-degree histogram incl. degree-0 sinks/sources (the dangling
    // set u_pagerank_dangling redistributes; the hub tail the salted
    // joins absorb). Exact integer buckets via length(bin(d)) -----
    "u_degree_dist" -> { (s, dir) =>
      val docs = tRaw(s, dir, "documents").select(col("doc_id"))
      val n = docs.count()
      val e1 = docs.select(
        col("doc_id").as("src"), ((col("doc_id") * 7 + 3) % n).as("dst"))
      val e2 = docs.select(
        col("doc_id").as("src"), ((col("doc_id") * 13 + 5) % n).as("dst"))
      val e3 = docs.filter(col("doc_id") % 5 === 0).select(
        col("doc_id").as("src"), (col("doc_id") % 37).as("dst"))
      graft.ops.GraphStats.degreeReport(
        e1.union(e2).union(e3), "src", "dst")
    },

    // ----- per-node triangle counts (NEW r13): the local-clustering
    // signal for link-farm/community analysis, over the SAME derived
    // link graph as u_pagerank. Canonical-edge wedges close against the
    // edge set — pure equi-joins, no cartesian -----
    "u_triangles" -> { (s, dir) =>
      val docs = tRaw(s, dir, "documents").select(col("doc_id"))
      val n = docs.count()
      val e1 = docs.select(
        col("doc_id").as("src"), ((col("doc_id") * 7 + 3) % n).as("dst"))
      val e2 = docs.select(
        col("doc_id").as("src"), ((col("doc_id") * 13 + 5) % n).as("dst"))
      val e3 = docs.filter(col("doc_id") % 5 === 0).select(
        col("doc_id").as("src"), (col("doc_id") % 37).as("dst"))
      graft.ops.GraphStats.triangles(
        e1.union(e2).union(e3), "src", "dst")
    },

    // ----- local clustering coefficients (NEW r13): exact integer ppm
    // (2·T·10⁶ intdiv d(d−1)) per node over the same link graph — the
    // closure metric link-farm thresholds read. Triangles + one degree
    // agg over the SAME cached canonical edges -----
    "u_clustering" -> { (s, dir) =>
      val docs = tRaw(s, dir, "documents").select(col("doc_id"))
      val n = docs.count()
      val e1 = docs.select(
        col("doc_id").as("src"), ((col("doc_id") * 7 + 3) % n).as("dst"))
      val e2 = docs.select(
        col("doc_id").as("src"), ((col("doc_id") * 13 + 5) % n).as("dst"))
      val e3 = docs.filter(col("doc_id") % 5 === 0).select(
        col("doc_id").as("src"), (col("doc_id") % 37).as("dst"))
      graft.ops.GraphStats.clusteringReport(
        e1.union(e2).union(e3), "src", "dst")
    },

    // ----- textbook PageRank with dangling-mass redistribution (NEW r10,
    // the r9 verdict's optional item 7): docs divisible by 3 emit NO
    // out-links but are linked to, so a third of the graph is dangling —
    // the fixture where the simplified variant visibly leaks mass and the
    // redistributing variant conserves it (up to floor rounding). Exact
    // integer arithmetic throughout; the dangling sum is a 1-row broadcast
    // per iteration, never a driver collect -----
    "u_pagerank_dangling" -> { (s, dir) =>
      val docs = tRaw(s, dir, "documents").select(col("doc_id"))
      val n = docs.count()
      val linkers = docs.filter(col("doc_id") % 3 =!= 0)
      val e1 = linkers.select(
        col("doc_id").as("src"), ((col("doc_id") * 7 + 3) % n).as("dst"))
      val e2 = linkers.select(
        col("doc_id").as("src"), ((col("doc_id") * 13 + 5) % n).as("dst"))
      graft.ops.PageRank.ranks(
        e1.union(e2), "src", "dst", iters = 4, redistributeDangling = true)
    },

    // ----- host-level authority (NEW r10): the COMPOSITION a web-curation
    // pipeline actually runs — per-doc link pairs → registered-domain
    // extraction (Urls) → integer-exact PageRank over the domain
    // multigraph (parallel edges keep their multiplicity: a domain linking
    // another 1000× contributes 1000 edge shares) -----
    "u_host_rank" -> { (s, dir) =>
      val docs = tRaw(s, dir, "documents").select(col("doc_id"))
      val n = docs.count()
      // src domains over mod 50, dst over mod 37/41: coprime moduli break
      // the regularity a single shared modulus would create (a perfectly
      // regular multigraph pageranks to the uniform vector — a trivial
      // gate); this fixture yields 42 distinct rank values over 50 domains
      def urlOf(c: Column, m: Int): Column = concat(
        lit("https://www.d"), (c % m).cast(StringType),
        lit(".com/p"), c.cast(StringType))
      val links = docs
        .select(
          urlOf(col("doc_id"), 50).as("src_url"),
          urlOf((col("doc_id") * 7 + 3) % n, 37).as("dst_url"))
        .union(docs.select(
          urlOf(col("doc_id"), 50).as("src_url"),
          urlOf((col("doc_id") * 13 + 5) % n, 41).as("dst_url")))
      graft.ops.PageRank.ranks(
        links.select(
          graft.ops.Urls.urlDomain(col("src_url")).as("src"),
          graft.ops.Urls.urlDomain(col("dst_url")).as("dst")),
        "src", "dst", iters = 3)
    },

    // ----- ANN recall evaluation (NEW r10): recall@k of the integer-exact
    // IVF (nprobe < cells — genuinely approximate) against the quantized
    // brute-force ground truth over the same codes. Both pipelines are
    // engine-deterministic, so the recall NUMBERS are hash-gated — the
    // measurement itself is verified, not just the measured systems -----
    "s_ann_recall" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val ann = IvfInt.topK(
        emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < IvfIntNQueries), "vec_id", "embedding",
        k = IvfIntK, cells = IvfIntCells, nprobe = IvfIntNprobe,
        iters = IvfIntIters)
      val truth = graft.ops.Quantize.quantizedTopK(
        emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < IvfIntNQueries), "vec_id", "embedding",
        k = IvfIntK)
      graft.ops.AnnEval.recallAtK(ann, truth, "query_id", "neighbor_id")
    },

    // ----- SQL function surface: the registered graft_* text functions
    // driven through spark.sql over a temp view — proves an SQL-only user
    // gets the same operators (and the same bits) as the DataFrame API -----
    "t_sql_surface" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s)
      t(s, dir, "documents").createOrReplaceTempView("graft_docs")
      s.sql(
        """SELECT doc_id,
          |  graft_lang_id(text) AS lang_pred,
          |  graft_token_count(text) AS n_tokens,
          |  graft_hash61(graft_normalize_answer(text)) AS norm_hash
          |FROM graft_docs""".stripMargin)
    },

    // ----- temperature-scaled mixing (tau=2 sqrt weighting, rates derived
    // from the corpus's own language counts) -----
    "t_temperature_mix" -> { (s, dir) =>
      graft.ops.Sampling.temperatureMix(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "doc_id",
        "lang")
        .select(col("doc_id"), col("lang"), col("copy"))
    },

    // ----- deterministic train/validation/test hash split (980/10/10) -----
    "t_hash_split" -> { (s, dir) =>
      graft.ops.Sampling.hashSplit(
        t(s, dir, "documents").select(col("doc_id")),
        "doc_id")
    },

    // ----- deterministic weighted corpus mixing (up/down-sampling) -----
    "t_corpus_mix" -> { (s, dir) =>
      graft.ops.Sampling.weightedMix(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "doc_id",
        "lang",
        MixWeights,
        MixDefault)
    },

    // ----- DSIR-style importance-weighted selection: keep the 100 raw
    // docs whose hashed-bigram distribution most resembles the target
    // slice (doc_id % 50 = 0, the decontamination benchmark convention) --
    "t_dsir_select" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      Dsir.selectTopK(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0),
        "doc_id",
        "text",
        k = 100,
        buckets = 8192)
    },

    // ----- corpus-level top-50 bigrams -----
    "t_top_bigrams" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(explode(
          TextFunctions.shingles(TextFunctions.words(col("text")), 2)).as("bigram"))
        .groupBy(col("bigram"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram").asc)
        .limit(50)
    },

    // ----- quality scoring -----
    "t_quality_score" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      d.select(
        col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("quality"))
    },

    // ----- within-doc n-gram repetition (boilerplate signal) -----
    "t_repetition" -> { (s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextFunctions.dupNgramRatio(col("text"), 2).as("dup_bigram_ratio"),
        TextFunctions.dupNgramRatio(col("text"), 3).as("dup_trigram_ratio"))
    },

    // ----- lexical diversity (Simpson index — the log-free portable
    // entropy surrogate; low diversity = keyword-stuffing / spam) -----
    "t_word_diversity" -> { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("__ws", TextFunctions.words(col("text")))
        .select(
          col("doc_id"),
          TextFunctions.simpsonConcentration(col("__ws"))
            .as("concentration"))
        .withColumn("diversity", lit(1.0) - col("concentration"))
    },

    // ----- hybrid retrieval: reciprocal-rank fusion of the BM25 keyword
    // ranking (documents) with a dense cosine ranking (the row-aligned
    // embeddings table, query vector = vec_id 0) — integer contributions,
    // so the fused scores hash-match -----
    "s_hybrid_rrf" -> { (s, dir) =>
      val sparse = graft.ops.Bm25
        .searchTopK(
          t(s, dir, "documents"),
          "doc_id",
          "text",
          query = Seq("spark", "join", "vector"),
          k = 200)
        .select(col("doc_id"), col("rank"))
      val emb = t(s, dir, "embeddings")
      val dense = Similarity
        .bruteForceTopK(
          emb,
          "vec_id",
          "embedding",
          emb.filter(col("vec_id") === 0),
          "vec_id",
          "embedding",
          k = 200)
        .select(col("neighbor_id").as("doc_id"), col("rank"))
      graft.ops.RankFusion
        .rrf(Seq(sparse, dense), "doc_id", "rank", k0 = 60, topK = 100)
    },

    // ----- retrieval-stack e2e composition (NEW r12): the full hybrid
    // retrieval flow users actually run, chained against ONE oracle (the
    // P36/P45/P91 pattern) — positional postings (P115) drive the query-
    // term selection (3 lowest-df = most informative terms, ties by
    // term), BM25 ranks them (P47), RRF fuses with the dense cosine
    // ranking (P68), and the fused list is scored per query bucket by the
    // rank-eval metrics (P124). Any drift in any stage shifts the final
    // 5-row metric relation. The 3-term collect is driver-bounded model
    // state (the IVF-centroid class). -----
    "p_retrieval_e2e" -> { (s, dir) =>
      // r16: cached — the chain reads the corpus THREE times (postings
      // term pick, BM25 scoring, qrels derivation); uncached, each pass
      // re-scanned the parquet and re-paid the fan exchange of the full
      // text column.
      val docs = graft.ops.Par.cached(t(s, dir, "documents"))
      val terms = graft.ops.TfIdf
        .postings(docs, "doc_id", "text")
        .select(col("term"), col("df"))
        .distinct()
        .orderBy(col("df").asc, col("term").asc)
        .limit(3)
        .collect()
        .map(_.getString(0))
        .toSeq
      val sparse = graft.ops.Bm25
        .searchTopK(docs, "doc_id", "text", query = terms, k = 200)
        .select(col("doc_id"), col("rank"))
      val emb = t(s, dir, "embeddings")
      val dense = Similarity
        .bruteForceTopK(
          emb,
          "vec_id",
          "embedding",
          emb.filter(col("vec_id") === 0),
          "vec_id",
          "embedding",
          k = 200)
        .select(col("neighbor_id").as("doc_id"), col("rank"))
      val fused = graft.ops.RankFusion
        .rrf(Seq(sparse, dense), "doc_id", "rank", k0 = 60, topK = 100)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("__fr").asc)
      val run = fused
        .select(
          (col("doc_id") % 5).as("query_id"),
          col("doc_id").as("d"),
          col("rank").as("__fr"))
        .withColumn("rank", row_number().over(w).cast(LongType))
        .drop("__fr")
      val qrels = docs
        .filter(
          TextFunctions.hash61(
            concat(lit("rel:"), col("doc_id").cast(StringType))) % 5 === 0)
        .select((col("doc_id") % 5).as("query_id"), col("doc_id").as("d"))
      graft.ops.RankEval.perQuery(run, qrels, "query_id", "d", "rank", k = 10)
    },

    // ----- fastText-style hashed linear classifier inference: broadcast
    // frozen integer weights (deterministic pseudo-model), map-side
    // scoring, threshold decision -----
    "t_quality_classifier" -> { (s, dir) =>
      graft.ops.HashedClassifier.scoreDocs(
        t(s, dir, "documents"),
        "doc_id",
        "text",
        graft.ops.HashedClassifier.pseudoWeights(s, buckets = 4096),
        buckets = 4096,
        biasMicro = -50000L,
        thresholdMicro = 0L)
    },

    // ----- CCNet-style per-language perplexity buckets: head/middle/tail
    // thirds of the within-language fluency ranking (integer slice math,
    // no float cutoffs) -----
    "t_ccnet_buckets" -> { (s, dir) =>
      graft.ops.NgramLm.perplexityBuckets(
        t(s, dir, "documents"),
        "doc_id",
        "text",
        "lang")
    },

    // ----- JSONL ingest with corrupt-line quarantine: a derived jsonl
    // fixture (to_json of selected fields; every 16th line by content
    // hash truncated 5 chars) decoded via from_json PERMISSIVE — corrupt
    // lines keep their raw payload, fields null -----
    "t_jsonl_ingest" -> { (s, dir) =>
      val line = to_json(struct(
        col("doc_id").as("id"),
        col("lang"),
        col("n_chars").as("nc")))
      val input = t(s, dir, "documents").select(
        col("doc_id"),
        when(
          pmod(TextFunctions.hash61(col("doc_id")), lit(16L)) === 0,
          substring(line, 1, 24)) // fixture lines are ≥ 25 chars
          .otherwise(line)
          .as("json"))
      graft.ops.JsonIngest.parseJsonl(
        input,
        "json",
        StructType.fromDDL("id long, lang string, nc long"))
    },

    // ----- interchange-format round-trip (NEW r13): ORC / CSV / JSON
    // write→read with pinned options must be byte-faithful. The corpus
    // text carries no CSV metacharacters, so an adversarial derived
    // column injects a quote, comma, newline and backslash into EVERY row
    // — the CSV quoting/multiLine and JSON escaping paths are genuinely
    // exercised; per-lang fingerprint aggregates of the read-back compare
    // against DuckDB over the UNTOUCHED parquet source -----
    "t_format_roundtrip" -> { (s, dir) =>
      val adv = concat(
        lit("\""), substring(col("text"), 1, 40),
        lit("\",\n\\"), col("lang"))
      val base = t(s, dir, "documents").select(
        col("doc_id"), col("lang"), col("source"),
        col("text"), col("n_chars"), adv.as("adv"))
      val root = GateTemp.dir("graft-format-roundtrip")
      graft.ops.Formats.supported.map { f =>
        graft.ops.Formats.roundTrip(base, f, s"$root/$f")
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            sum(col("doc_id")).as("sum_id"),
            sum(TextFunctions.hashMod(col("text"))).as("text_fp"),
            sum(TextFunctions.hashMod(col("adv"))).as("adv_fp"),
            sum(TextFunctions.hashMod(col("source"))).as("source_fp"))
          .withColumn("format", lit(f))
      }.reduce(_ unionByName _)
    },

    // ----- parquet codec round-trip (NEW r13): the storage-codec choice
    // is a real 100 TB lever (zstd vs snappy is a ~2x footprint swing) —
    // each codec must be a pure space/CPU trade with ZERO effect on
    // bytes read back; per-lang fingerprints vs DuckDB over the source -----
    "t_codec_roundtrip" -> { (s, dir) =>
      val base = t(s, dir, "documents").select(
        col("doc_id"), col("lang"), col("text"), col("n_chars"))
      val root = GateTemp.dir("graft-codec-roundtrip")
      Seq("uncompressed", "snappy", "gzip", "zstd").map { c =>
        base.write.mode("overwrite")
          .option("compression", c)
          .parquet(s"$root/$c")
        s.read.parquet(s"$root/$c")
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            sum(TextFunctions.hashMod(col("text"))).as("text_fp"))
          .withColumn("codec", lit(c))
      }.reduce(_ unionByName _)
    },

    // ----- ingest e2e composition (NEW r13): the storage ops as ONE
    // chained flow — slice A arrives as CSV, slice B as JSONL carrying
    // re-ingested duplicates of A (same text, new ids), union → exact
    // dedup (keep-min collapses the re-ingests back to their originals)
    // → partitioned write → pruned read. The oracle replays the dedup
    // and pruning from the untouched parquet; the two format legs are
    // identity by the t_format_roundtrip contract, so ANY ingest
    // corruption, dedup drift, or partition-encode bug diverges the
    // per-lang fingerprints -----
    "p_ingest_e2e" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val root = GateTemp.dir("graft-ingest-e2e")
      val cols = Seq("doc_id", "lang", "text", "n_chars").map(col)
      val a = graft.ops.Formats.roundTrip(
        docs.filter(col("doc_id") % 2 === 1).select(cols: _*),
        "csv", s"$root/a")
      val reingested = docs
        .filter(col("doc_id") % 2 === 1 && col("doc_id") % 10 === 1)
        .select(
          (col("doc_id") + 1000000L).as("doc_id"),
          col("lang"), col("text"), col("n_chars"))
      val b = graft.ops.Formats.roundTrip(
        docs.filter(col("doc_id") % 2 === 0).select(cols: _*)
          .unionByName(reingested),
        "json", s"$root/b")
      val all = a.unionByName(b)
      val keep = Dedup.exact(all, "doc_id", "text")
        .select(col("doc_id_kept").as("doc_id"))
      all.join(keep, Seq("doc_id"), "left_semi")
        .write.partitionBy("lang").parquet(s"$root/out")
      s.read.parquet(s"$root/out")
        .filter(pmod(TextFunctions.hash61(col("lang")), lit(3L)) < 2)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(TextFunctions.hashMod(col("text"))).as("text_fp"))
    },

    // ----- Misra-Gries heavy hitters, AUDITED (NEW r13, upgrades P41
    // from spec-only): raw estimates are merge-order-dependent so they
    // can't hash-gate, but the GUARANTEES are order-independent — the
    // gate REQUIRES in-gate that (a) every key with true count > n/(k+1)
    // is in the sketch, (b) every estimate satisfies est ≤ true ≤
    // est + err, (c) err ≤ n/(k+1) — then hash-gates the exact counts of
    // the guaranteed set (integral compare: cnt·(k+1) > n, no division).
    // The sketch is the 100 TB path (O(k) per task, no key shuffle); the
    // exact histogram here is the test-scale audit, and the collects are
    // O(k) driver-bounded -----
    "t_heavy_hitters" -> { (s, dir) =>
      val k = 32
      val words = t(s, dir, "documents")
        .select(explode(TextFunctions.words(col("text"))).as("word"))
      val summary = graft.ops.HeavyHitters.sketch(words, col("word"), k)
      val exact = graft.ops.Par.cached(
        words.groupBy(col("word")).agg(count(lit(1)).as("n_exact")))
      val n = exact.agg(sum(col("n_exact"))).head().getLong(0)
      require(
        summary.n == n,
        s"sketch saw ${summary.n} items, corpus holds $n")
      require(
        summary.err <= n / (k + 1),
        s"summary err ${summary.err} exceeds n/(k+1) = ${n / (k + 1)}")
      val guaranteed = exact
        .filter(col("n_exact") * (k + 1) > lit(n))
      guaranteed.collect().foreach { r => // ≤ k+1 rows by the guarantee
        val w = r.getString(0)
        require(
          summary.counts.contains(w),
          s"true heavy hitter '$w' (count ${r.getLong(1)}) missing " +
            s"from the sketch")
      }
      val trueOfSketch = exact
        .filter(col("word").isin(summary.counts.keys.toSeq: _*))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      summary.counts.foreach { case (w, est) =>
        val tc = trueOfSketch.getOrElse(w, 0L)
        require(
          est <= tc && tc <= est + summary.err,
          s"estimate $est for '$w' violates [est, est+err] around $tc")
      }
      guaranteed
    },

    // ----- schema evolution across file generations (NEW r13): a live
    // corpus accretes columns — generation 1 lacks n_chars, generation 2
    // has it; a mergeSchema read must surface the union schema with nulls
    // for pre-evolution rows and the generation as a partition column -----
    "t_schema_evolution" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val root = GateTemp.dir("graft-schema-evolution") + "/t"
      docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("lang"))
        .write.parquet(s"$root/gen=1")
      docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .write.parquet(s"$root/gen=2")
      s.read.option("mergeSchema", "true").parquet(root)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("gen"))
    },

    // ----- approx-distinct audit (NEW r13): HLL++ is the 100 TB way to
    // count distincts without a shuffle of the values; the gate REQUIRES
    // in-gate that the estimate lands within the configured rsd against
    // the exact count per lang (loud failure if the sketch degrades), and
    // hash-gates the exact ground truth the audit ran against -----
    "t_approx_distinct" -> { (s, dir) =>
      val perLang = t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(
          countDistinct(col("text")).as("n_exact"),
          approx_count_distinct(col("text"), rsd = 0.05).as("n_approx"))
      val bad = perLang.filter(
        abs(col("n_approx") - col("n_exact")) >
          col("n_exact") * 0.15).count()
      require(bad == 0L, s"$bad langs with approx-distinct off by >15%")
      perLang.select(col("lang"), col("n_exact"))
    },

    // ----- data-quality constraint report (NEW r13): the Deequ-style
    // expectations gate every ingest runs before publishing. A dirty
    // slice (every 101st orderkey re-ingested with negated price, alien
    // status, null date, duplicated key, orphaned custkey) is injected so
    // every constraint type counts REAL violations — all row predicates
    // fold into ONE aggregate pass, uniqueness is one key exchange, FK
    // distincts the child keys before the anti-join -----
    "t_data_quality" -> { (s, dir) =>
      val orders = t(s, dir, "orders")
      val customer = t(s, dir, "customer")
      val dirty = orders
        .filter(col("o_orderkey") % 101 === 0)
        .select(
          col("o_orderkey"),
          (col("o_custkey") + 1000000L).as("o_custkey"),
          lit("X").as("o_orderstatus"),
          (col("o_totalprice") * -1.0).as("o_totalprice"),
          lit(null).cast(TimestampType).as("o_orderdate"),
          col("o_orderpriority"))
      val all = orders.unionByName(dirty)
      graft.ops.DataQuality.combine(
        graft.ops.DataQuality.predicateReport(all, Seq(
          "totalprice_positive" -> (col("o_totalprice") > 0.0),
          "status_in_domain" -> col("o_orderstatus").isin("O", "F", "P"),
          "orderdate_not_null" -> col("o_orderdate").isNotNull)),
        graft.ops.DataQuality.uniqueReport(
          all, Seq("o_orderkey"), "orderkey_unique"),
        graft.ops.DataQuality.fkReport(
          all, "o_custkey", customer, "c_custkey", "custkey_fk"))
    },

    // ----- hive-partitioned layout + partition pruning (NEW r13): write
    // partitionBy(lang), read back through a deterministic partition-column
    // predicate — the scan must PRUNE to matching directories (the spec
    // asserts inputFiles; here the verdict is value-fidelity through the
    // partition-encode/decode round trip plus the pruned-read path) -----
    "t_partitioned_layout" -> { (s, dir) =>
      val root = GateTemp.dir("graft-partitioned-layout") + "/p"
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
        .write.mode("overwrite").partitionBy("lang").parquet(root)
      s.read.parquet(root)
        .filter(pmod(TextFunctions.hash61(col("lang")), lit(3L)) < 2)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(TextFunctions.hashMod(col("text"))).as("text_fp"))
    },

    // ----- corpus composition report ("corpus card"): one-pass per
    // (lang, source) doc/token/char/distinct-content stats -----
    // ----- power-of-two length histogram (NEW r10): packing/window design
    // input; bucket = exact integer log2+1 via length(bin(n)) -----
    "t_length_histogram" -> { (s, dir) =>
      graft.ops.CorpusStats.lengthHistogram(t(s, dir, "documents"), "text")
    },

    "t_corpus_report" -> { (s, dir) =>
      graft.ops.CorpusStats.corpusReport(
        t(s, dir, "documents"),
        "text",
        Seq("lang", "source"))
    },

    // ----- mixture plan: measured per-lang token counts + target shares
    // + a budget -> per-lang sampling rates (integer rational math; the
    // corpusReport -> weightedMix bridge) -----
    "t_mixture_plan" -> { (s, dir) =>
      val stats = graft.ops.CorpusStats.corpusReport(
        t(s, dir, "documents"), "text", Seq("lang"))
      Sampling.mixturePlan(
        stats, "lang", "n_tokens",
        targetsPerMille = MixPlanTargets,
        defaultPerMille = MixPlanDefault,
        budget = MixPlanBudget,
        maxPerMille = MixPlanMax)
    },

    // ----- mixture e2e composition (NEW r12): plan -> sample ->
    // interleave chained against ONE oracle (the P36/P45/P91 pattern).
    // The P75 plan's derived per-lang rates feed P23's weightedMixCol
    // through a broadcast join (fully distributed — no driver hop), the
    // mixed copies get unique ids (doc_id*1000+copy), and P113 interleaves
    // the physical training order by language. Any drift in the plan
    // rates, the copy hash gate, or the interleave positions fails the
    // chained hash. -----
    "t_mixture_e2e" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val stats = graft.ops.CorpusStats.corpusReport(docs, "text", Seq("lang"))
      val plan = Sampling.mixturePlan(
        stats, "lang", "n_tokens",
        targetsPerMille = MixPlanTargets,
        defaultPerMille = MixPlanDefault,
        budget = MixPlanBudget,
        maxPerMille = MixPlanMax)
      val mixed = Sampling.weightedMixCol(
        docs
          .select(col("doc_id"), col("lang"))
          .join(
            broadcast(plan.select(col("lang"), col("rate_per_mille"))),
            Seq("lang")),
        "doc_id",
        col("rate_per_mille"))
      val withId = mixed.select(
        (col("doc_id") * 1000 + col("copy")).as("mixed_id"),
        col("doc_id"),
        col("copy"),
        col("lang"))
      graft.ops.Packing.interleaveBySource(withId, "mixed_id", "lang")
    },

    // ----- Gopher repetition rule bundle (Rae et al. 2021 Table A1):
    // duplicate-line fractions over a derived multi-line fixture (the
    // corpus text is single-line) + top/duplicated n-gram char fractions
    // over the real text -----
    "t_gopher_repetition" -> { (s, dir) =>
      val d = col("doc_id")
      val multiline = concat(
        lit("shared boilerplate line\nunique content "),
        d.cast(StringType),
        lit("\n"),
        when(d % 3 === 0, lit("shared boilerplate line"))
          .otherwise(concat(lit("another unique "), d.cast(StringType))))
      t(s, dir, "documents")
        .withColumn("__lines", split(multiline, "\n"))
        .withColumn(
          "__bi",
          TextFunctions.shingles(TextFunctions.words(col("text")), 2))
        .withColumn(
          "__tri",
          TextFunctions.shingles(TextFunctions.words(col("text")), 3))
        .select(
          col("doc_id"),
          TextFunctions.dupElemFrac(col("__lines")).as("dup_line_frac"),
          TextFunctions.dupElemCharFrac(col("__lines"))
            .as("dup_line_char_frac"),
          TextFunctions.topNgramCharFrac(col("__bi"), length(col("text")))
            .as("top_bigram_char_frac"),
          TextFunctions.dupNgramCharFrac(col("__tri"), length(col("text")))
            .as("dup_trigram_char_frac"))
    },

    // ----- sequence packing into fixed-capacity training bins -----
    "t_seq_pack" -> { (s, dir) =>
      graft.ops.Packing.sequencePack(
        t(s, dir, "documents"),
        "doc_id",
        TextFunctions.tokenCount(col("text")),
        capacity = 256,
        partCols = Seq("lang"),
        shards = 4)
    },

    // ----- train/test decontamination (n-gram collision vs benchmark) -----
    // Benchmark = every 50th doc (a stand-in eval suite); corpus = the rest.
    // Both sides share the hashed-shingle construction with the dedup family.
    "t_decontaminate" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      graft.ops.Decontaminate.ngramOverlap(
        docs.filter(col("doc_id") % 50 =!= 0),
        "doc_id",
        col("text"),
        docs.filter(col("doc_id") % 50 === 0),
        col("text"),
        n = 3)
    },

    // transpose view: which BENCHMARK items are burned, and how fully
    "t_leak_report" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      graft.ops.Decontaminate.leakReport(
        docs.filter(col("doc_id") % 50 =!= 0),
        "doc_id",
        col("text"),
        docs.filter(col("doc_id") % 50 === 0),
        "doc_id",
        col("text"),
        n = 3)
    },

    // ----- decontamination at production gram length (sparse shingles) -----
    // Real sweeps run n=8-13 (GPT-3 appendix C used 13): at long n most
    // docs share nothing and only genuine leaks surface.
    "t_decontaminate8" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      graft.ops.Decontaminate.ngramOverlap(
        docs.filter(col("doc_id") % 50 =!= 0),
        "doc_id",
        col("text"),
        docs.filter(col("doc_id") % 50 === 0),
        col("text"),
        n = 8)
    },

    // ----- language identification vs. labeled lang column -----
    "t_lang_id" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(
          col("lang"),
          TextFunctions.langId(col("text")).as("predicted"))
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n_docs"))
    },

    // ----- brute-force cosine top-k -----
    // The query set is a FIXED-size id prefix (100 ids), not a corpus
    // fraction: the broadcast side must stay O(k) as the corpus grows — the
    // brute-force operator's scale contract is |queries| ≪ |corpus|.
    "s_cosine_topk" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(
        emb,
        "vec_id",
        "embedding",
        emb.filter(col("vec_id") < 100),
        "vec_id",
        "embedding",
        k = 5)
    },

    // ----- hard-negative mining: top-k nearest neighbors with a DIFFERENT
    // label — the contrastive-training counterpart of s_cosine_topk -----
    "s_hard_negatives" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.hardNegatives(
        emb,
        "vec_id",
        "embedding",
        "label",
        emb.filter(col("vec_id") < 100),
        "vec_id",
        "embedding",
        "label",
        k = 5)
    },

    // ----- deterministic ordered mean pooling: 5-chunk groups → one
    // pooled doc embedding (bit-reproducible fold, unlike avg()) -----
    // GATE SHAPE: the op returns `pooled array<double>`, but the driver's
    // oracle harness can only sort/hash scalar columns (r9: pandas
    // `unhashable type: numpy.ndarray`), so the gate posexplodes the
    // vector to one (g_id, n_members, dim, value) row per dimension — the
    // s_pq_codebooks precedent. The public API is unchanged.
    "s_mean_pool" -> { (s, dir) =>
      Similarity
        .meanPool(
          t(s, dir, "embeddings")
            .withColumn("g_id", col("vec_id") % 100),
          "g_id",
          "vec_id",
          "embedding")
        .select(
          col("g_id"),
          col("n_members"),
          posexplode(col("pooled")).as(Seq("dim", "value")))
    },

    // ----- IVF cell assignment (the map-side step of ivfTopK) -----
    // Fixed centroids = the four lowest-id corpus vectors: the gate tests
    // the assignment math (broadcast dot scores, argmax, first-index ties),
    // which is the part of IVF a relational oracle CAN replay — recall
    // behavior of the full ANN stays pinned by spec floors.
    "s_ivf_assign" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val centroids = emb
        .filter(col("vec_id") < 4)
        .orderBy(col("vec_id"))
        .select(col("embedding"))
        .collect()
        .map(_.getSeq[Float](0).toArray)
      Similarity.ivfAssign(emb, "vec_id", "embedding", centroids)
    },

    // ----- PCA -> ANN end-to-end (rows-only gate: float-sum reassociation
    // keeps PCA itself out of hash gating, but the composed pipeline's
    // schema and row count are pinned here: every vector reduces to k dims
    // and lands in exactly one coarse cell). r15: the gate now REQUIRES
    // PCA's actual contract in-gate — the 8 components' captured-variance
    // share of the total corpus variance above a measured floor. (A
    // recall@k floor was measured first and carries NO signal here: the
    // synthetic embeddings are near-isotropic, so full-space neighbors are
    // noise-grade and ANY projection scrambles them — measured pca-space
    // recall@5 0.04-0.10. Variance share is the signal that distinguishes
    // a real eigenbasis from a broken one: a random 8-dim subspace
    // captures ~k/dim in expectation, the fitted basis strictly more;
    // a collapsed/non-orthonormal basis strictly less.)
    "s_pca_ann" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val model = graft.ops.Pca.fit(emb, "embedding", 8)
      // total variance = E[||x||^2] - ||mu||^2 (one cheap agg pass)
      val st = emb.agg(
        sum(Similarity.norm2(col("embedding").cast("array<float>"))
            .cast("double"))
          .as("ss"),
        count(lit(1)).as("n")).collect().head
      val total =
        st.getDouble(0) / st.getLong(1) - model.mean.map(m => m * m).sum
      val share = model.explainedVariance.sum / total
      require(share >= PcaVarianceShareFloor,
        f"s_pca_ann captured-variance share = $share%.4f fell below the " +
          f"$PcaVarianceShareFloor floor - the eigenbasis regressed " +
          "(random-subspace baseline is k/dim)")
      val reduced = emb.withColumn(
        "pca",
        graft.ops.Pca.project(model, col("embedding")).cast("array<float>"))
      val redCached = graft.ops.Par.cached(reduced)
      val centroids = redCached
        .filter(col("vec_id") < 4)
        .orderBy(col("vec_id"))
        .select(col("pca"))
        .collect()
        .map(_.getSeq[Float](0).toArray)
      Similarity.ivfAssign(redCached, "vec_id", "pca", centroids)
    },

    // ----- embedding-cosine near-dup pairs (LSH-blocked scale path) -----
    // Gates the bucket-blocked variant (pair space per bucket, never
    // corpus²); the deterministic md5-derived hyperplanes are replayed in
    // the DuckDB oracle. The exact O(N²) path remains the verification
    // baseline in SimilaritySpec.
    "s_embed_neardup" -> { (s, dir) =>
      Similarity.cosineNearDupPairs(
        t(s, dir, "embeddings"),
        "vec_id",
        "embedding",
        threshold = 0.45,
        planes = 2)
    },

    // ----- deterministic exact-quota sample (k smallest salted hashes
    // per stratum) -----
    "t_quota_sample" -> { (s, dir) =>
      graft.ops.Sampling
        .quotaSample(t(s, dir, "documents"), "doc_id", 20, Seq("lang"))
        .select(col("doc_id"), col("lang"))
    },

    // ----- per-group rank normalization (NEW r10): token-count score
    // mapped to [0, 1e6] by within-language rank — the cross-language
    // score-calibration step (CCNet's percentile bucketing is this + a
    // CASE). Integer score + id tie-break = engine-exact ranks -----
    "t_rank_normalize" -> { (s, dir) =>
      graft.ops.Sampling
        .rankNormalize(
          t(s, dir, "documents")
            .select(
              col("doc_id"), col("lang"),
              TextFunctions.tokenCount(col("text")).cast(LongType)
                .as("n_tokens")),
          Seq("lang"),
          "doc_id",
          col("n_tokens"))
    },

    // ----- corpus drift report (NEW r10): top-100 tokens whose relative
    // frequency diverges most between the even- and odd-doc_id halves —
    // the distribution check a mixture/refresh pipeline ships with -----
    "t_corpus_drift" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      graft.ops.CorpusStats.corpusDrift(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        "text",
        k = 100)
    },

    // ----- script-mix profile (NEW r10): per-script char ppm + dominant
    // script — the routing signal stopword langId can't give on CJK or
    // mixed-script spam. Fixture injects CJK / Cyrillic / Arabic runs by
    // doc_id residue (raw testdata is Latin-only); oracle replays the
    // same injection via chr() codes generated from these constants -----
    "t_scripts" -> { (s, dir) =>
      val injected = concat(
        col("text"),
        when(col("doc_id") % 3 === 0, lit(ScriptFixtureCjk))
          .otherwise(lit("")),
        when(col("doc_id") % 4 === 0, lit(ScriptFixtureCyr))
          .otherwise(lit("")),
        when(col("doc_id") % 6 === 0, lit(ScriptFixtureArab))
          .otherwise(lit("")))
      val base = t(s, dir, "documents")
        .select(col("doc_id"), injected.as("txt"))
        .select(
          col("doc_id") +:
            TextFunctions.ScriptClasses.map { case (name, _) =>
              TextFunctions.scriptPpm(col("txt"), name).as(s"${name}_ppm")
            }: _*)
      val maxPpm = greatest(
        TextFunctions.ScriptClasses.map(c => col(s"${c._1}_ppm")): _*)
      val dominant = TextFunctions.ScriptClasses
        .foldRight(lit("none")) { case ((name, _), elseCol) =>
          when(col(s"${name}_ppm") === maxPpm && maxPpm > 0, lit(name))
            .otherwise(elseCol)
        }
      base.withColumn("dominant", dominant)
    },

    // ----- encoding-artifact (mojibake) detection (NEW r10): replacement
    // chars + C1 controls + UTF-8-as-cp1252 marker sequences, per million
    // chars. The fixture injects artifacts deterministically by doc_id
    // residue (the raw testdata is clean — an all-zero gate would prove
    // nothing); the oracle replays the same injection with chr() codes --
    "t_mojibake" -> { (s, dir) =>
      val injected = concat(
        col("text"),
        when(col("doc_id") % 5 === 0, lit("\u00C3\u00A9\u00C3\u00A8"))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 0, lit("\uFFFD")).otherwise(lit("")),
        when(col("doc_id") % 11 === 0, lit("\u0085\u0092"))
          .otherwise(lit("")),
        when(col("doc_id") % 13 === 0, lit("\u00E2\u20AC\u2122"))
          .otherwise(lit("")))
      t(s, dir, "documents")
        .select(col("doc_id"), injected.as("txt"))
        .select(
          col("doc_id"),
          TextFunctions.replacementCharCount(col("txt")).as("n_replacement"),
          TextFunctions.c1ControlCount(col("txt")).as("n_c1"),
          TextFunctions.mojibakeSeqCount(col("txt")).as("n_moji"),
          TextFunctions.encodingArtifactPpm(col("txt")).as("artifact_ppm"))
        .withColumn(
          "clean",
          col("n_replacement") + col("n_c1") + col("n_moji") === 0L)
    },

    // ----- confusable-skeleton dedup (NEW r13): homoglyph obfuscation
    // (Latin -> Cyrillic lookalikes + zero-width padding) defeats exact
    // AND shingle dedup — the skeleton (UTS #39 subset via one translate)
    // folds it back. Every 37th doc gets an obfuscated twin; the gate
    // REQUIRES in-gate that every twin is invisible to raw hashing yet
    // caught by its skeleton, then hash-gates per-doc dup counts under
    // both hashings -----
    "t_confusables" -> { (s, dir) =>
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val twins = docs
        .filter(col("doc_id") % 37 === 0)
        .select(
          (col("doc_id") + 10000000L).as("doc_id"),
          concat(
            translate(
              col("text"),
              "aeopcyx",
              "\u0430\u0435\u043E\u0440\u0441\u0443\u0445"),
            lit("\u200B")).as("text"))
      val corpus = docs.unionByName(twins)
      // r16 (guide §1/§2.3): the fingerprint frame feeds THREE plan
      // branches (row side + both dup-count aggregates) and the gate runs
      // two in-gate audit actions before the timed sink — uncached, the
      // translate+hash pass over the corpus ran ~5x. Caching skel and the
      // joined result computes each once; values are unchanged.
      val skel = graft.ops.Par.cached(corpus.select(
        col("doc_id"),
        TextFunctions.hashMod(col("text")).as("raw_fp"),
        TextFunctions.hashMod(
          TextFunctions.confusableSkeleton(col("text"))).as("skel_fp")))
      val out = graft.ops.Par.cached(skel
        .join(
          skel.groupBy("skel_fp").agg(count(lit(1)).as("__ns")), "skel_fp")
        .join(
          skel.groupBy("raw_fp").agg(count(lit(1)).as("__nr")), "raw_fp")
        .select(
          col("doc_id"),
          (col("__ns") - 1L).as("skel_dups"),
          (col("__nr") - 1L).as("raw_dups")))
      val missedTwins = out
        .filter(col("doc_id") >= 10000000L && col("skel_dups") < 1).count()
      require(missedTwins == 0L,
        s"t_confusables: $missedTwins obfuscated twins NOT caught by the " +
          "skeleton \u2014 the confusable fold is broken")
      val evasions = out
        .filter(col("skel_dups") > col("raw_dups")).count()
      require(evasions > 0L,
        "t_confusables: no doc shows skeleton-only duplication \u2014 the " +
          "fixture injected nothing")
      out
    },

    // ----- systematic PPS sampling (NEW r10): EXACTLY k = 100 selection
    // points over the cumulative token axis in keyed-hash order \u2014 fixed
    // sample size (no binomial jitter), weight-proportional inclusion,
    // pure integer grid-crossing arithmetic -----
    "t_systematic_sample" -> { (s, dir) =>
      graft.ops.Sampling
        .systematicSample(
          t(s, dir, "documents").select(col("doc_id"), col("text")),
          "doc_id",
          TextFunctions.tokenCount(col("text")),
          k = 100L)
        .select(col("doc_id"), col("n_hits"))
    },

    // ----- SemDeDup-style semantic dedup (bucketed pairs \u2192 clusters \u2192
    // keep-one) \u2014 survivors of the embedding corpus -----
    "s_semantic_dedup" -> { (s, dir) =>
      Similarity.semanticDedup(
        t(s, dir, "embeddings"),
        "vec_id",
        "embedding",
        threshold = 0.45,
        planes = 2)
        .select(col("vec_id"), col("label"))
    },

    // ----- overlapping word-window chunking (RAG / sequence prep) -----
    "t_chunk_docs" -> { (s, dir) =>
      Chunking.chunkWords(
        t(s, dir, "documents"), "doc_id", col("text"),
        chunkSize = 50, overlap = 10)
    },

    // ----- segment-level corpus dedup (first occurrence survives) -----
    // window mode (explicit opt-out of the skew-safe default)
    "p_segment_dedup" -> { (s, dir) =>
      Dedup.dedupSegments(
        t(s, dir, "documents"),
        "doc_id",
        Chunking.wordWindows(col("text"), 10),
        skewSafe = false)
    },

    // frequency-thresholded boilerplate removal: every occurrence of any
    // 10-word window shared by >= 2 docs is dropped (the documents table's
    // exact-duplicate clusters make this bite: duplicated docs lose all
    // their windows, unique docs keep everything)
    "p_segment_boilerplate" -> { (s, dir) =>
      Dedup.dropFrequentSegments(
        t(s, dir, "documents"),
        "doc_id",
        Chunking.wordWindows(col("text"), 10),
        minDocs = 2)
    },

    // ----- per-SOURCE boilerplate removal (NEW r10): the document-
    // frequency rule scoped by `source` \u2014 a window is dropped only when
    // >= 2 docs of the SAME source share it, so site templates vanish but
    // cross-site common phrases survive (the RefinedWeb per-site variant)
    "p_source_boilerplate" -> { (s, dir) =>
      Dedup.dropFrequentSegments(
        t(s, dir, "documents"),
        "doc_id",
        Chunking.wordWindows(col("text"), 10),
        minDocs = 2,
        groupCols = Seq("source"))
    },

    // ----- SENTENCE-level boilerplate removal (NEW r10): P89 sentences +
    // P46 dropFrequentSegments composed \u2014 the RefinedWeb line-level rule
    // at sentence granularity. Fixture: every doc wrapped in newsletter/
    // rights/cookie boilerplate sentences that must all vanish while the
    // doc's own sentence survives -----
    "p_sentence_boilerplate" -> { (s, dir) =>
      val fixture = concat(
        lit("Subscribe to our newsletter. "),
        col("text"),
        lit(". All rights reserved. Cookie policy applies."))
      Dedup.dropFrequentSegments(
        t(s, dir, "documents").withColumn("text", fixture),
        "doc_id",
        TextFunctions.sentences(col("text")),
        minDocs = 2)
    },

    // Lee-et-al-style exact substring dedup: maximal cross-doc duplicated
    // spans at 20-word window granularity (747 distinct duplicated windows
    // in this corpus \u2014 the exact-duplicate doc clusters merge into
    // whole-document spans)
    "p_dup_spans" -> { (s, dir) =>
      Dedup.duplicatedSpans(
        t(s, dir, "documents"), "doc_id", col("text"), k = 20)
    },

    // the exact-collapse scale path: identical result (same oracle), the
    // window stream shrinks by the duplication factor
    "p_dup_spans_fast" -> { (s, dir) =>
      Dedup.duplicatedSpansCollapsed(
        t(s, dir, "documents"), "doc_id", col("text"), k = 20)
    },

    // and the removal: rebuild every doc minus its duplicated spans
    "p_span_removed" -> { (s, dir) =>
      Dedup.removeDuplicatedSpans(
        t(s, dir, "documents"), "doc_id", col("text"), k = 20)
    },

    // intra-document variant: first occurrence per distinct segment WITHIN
    // each doc, shuffle-free fold
    "p_segment_dedup_doc" -> { (s, dir) =>
      Dedup.dedupSegmentsWithinDoc(
        t(s, dir, "documents"),
        "doc_id",
        Chunking.wordWindows(col("text"), 10))
    },

    // the skew-safe two-phase plan (the default): same oracle, different
    // physical shape \u2014 hot segments collapse map-side instead of landing on
    // one window task
    "p_segment_dedup_skewsafe" -> { (s, dir) =>
      Dedup.dedupSegments(
        t(s, dir, "documents"),
        "doc_id",
        Chunking.wordWindows(col("text"), 10))
    },

    // ----- cross-corpus exact dedup (drop docs seen in another corpus) --
    "p_cross_dedup" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val seen = docs.filter(col("doc_id") % 50 === 0).select(col("text"))
      Dedup
        .dropSeenIn(docs, "text", seen, "text")
        .select(col("doc_id"), col("lang"), col("source"))
    },

    // ----- exact distributed quantiles (length-cap / quality-floor
    // thresholds; binary-exact qs keep ceil(q*n) integer-exact) -----
    "t_quantiles" -> { (s, dir) =>
      Sampling.exactQuantiles(
        t(s, dir, "documents"),
        "doc_id",
        col("n_chars"),
        Seq(0.25, 0.5, 0.75, 0.875, 1.0))
    },

    // ----- approx-quantile audit (NEW r13): percentile_approx (Greenwald-
    // Khanna summaries \u2014 the mergeable one-pass sketch that replaces the
    // rangePrefix machinery when rank error is tolerable at 100 TB) is
    // REQUIRED in-gate to land inside the exact \u00B11/32 rank band around
    // each target; the hash-gated output is the exact ground truth the
    // audit ran against (the t_approx_distinct pattern) -----
    "t_approx_quantiles" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val qs = Seq(0.125, 0.5, 0.9375)
      val eps = 0.03125 // 1/32: binary-exact, ceil(q\u00B7n) integer-stable
      val bandQs = qs.map(_ - eps) ++ qs.map(_ + eps)
      val bands = Sampling
        .exactQuantiles(docs, "doc_id", col("n_chars"), bandQs)
        .collect()
        .map(r => r.getDouble(0) -> r.getAs[Number](1).longValue())
        .toMap
      val approx = docs
        .agg(percentile_approx(
          col("n_chars"),
          array(qs.map(lit): _*),
          lit(10000)).as("ap"))
        .head()
        .getSeq[Long](0)
      qs.zipWithIndex.foreach { case (q, i) =>
        val (lo, hi) = (bands(q - eps), bands(q + eps))
        require(
          approx(i) >= lo && approx(i) <= hi,
          s"t_approx_quantiles: sketch value ${approx(i)} for q=$q outside " +
            s"the exact \u00B1$eps rank band [$lo, $hi] \u2014 the quantile summary " +
            "degraded past its configured accuracy")
      }
      Sampling.exactQuantiles(docs, "doc_id", col("n_chars"), qs)
    },

    // per-group variant: one shuffle on the group key, no driver pass
    "t_group_quantiles" -> { (s, dir) =>
      Sampling.groupQuantiles(
        t(s, dir, "documents"),
        Seq("lang"),
        "doc_id",
        col("n_chars"),
        Seq(0.25, 0.5, 0.875))
    },

    // ----- per-group winsorization (NEW r10): clamp the score into its
    // group's exact [12.5%, 87.5%] quantile band (binary-exact fractions:
    // 0.1\u00B7n is not exactly representable and ceil() could cross an
    // integer differently per engine) \u2014 outlier robustification before
    // mixture weighting -----
    "t_winsorize" -> { (s, dir) =>
      Sampling.winsorize(
        t(s, dir, "documents").select(
          col("doc_id"), col("lang"), col("n_chars")),
        Seq("lang"),
        "doc_id",
        col("n_chars"),
        pLo = 0.125,
        pHi = 0.875)
    },

    // ----- END-TO-END curation pipeline: quality gate -> exact dedup ->
    // decontaminate vs held-out benchmark -> token-budget cut. Every stage
    // is an individually-gated operator; this gate pins their COMPOSITION
    // (the library's primary use) against one chained oracle. -----
    "p_curation_e2e" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      curationChain(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0),
        budget = 8000L,
        score = col("n_chars"))
        .select(col("doc_id"), col("n_chars"), col("cum_tokens"))
    },

    // ----- token-budget corpus selection (best docs by n_chars until the
    // cumulative whitespace-token count fills the budget) -----
    "t_token_budget" -> { (s, dir) =>
      Sampling
        .tokenBudgetSelect(
          t(s, dir, "documents"),
          "doc_id",
          TextFunctions.tokenCount(col("text")),
          col("n_chars"),
          budget = 15000L)
        .select(col("doc_id"), col("n_chars"), col("cum_tokens"))
    },

    // ----- per-group token budgets (the mixture cut: per-lang budgets;
    // es/fr absent from the map -> dropped) -----
    "t_group_budget" -> { (s, dir) =>
      graft.ops.Sampling
        .groupTokenBudget(
          t(s, dir, "documents"),
          "doc_id",
          TextFunctions.tokenCount(col("text")),
          col("n_chars"),
          "lang",
          Map("en" -> 8000L, "de" -> 4000L, "zh" -> 2000L))
        .select(col("doc_id"), col("lang"), col("n_chars"), col("cum_tokens"))
    },

    // ----- cross-corpus NEAR-dup dedup (parity split: even doc_ids are
    // the "new crawl", odd the already-ingested corpus) -----
    "p_cross_neardup" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      Dedup
        .dropNearSeenIn(
          docs.filter(col("doc_id") % 2 === 0), "text",
          docs.filter(col("doc_id") % 2 === 1), "text",
          n = 3, bands = 4, threshold = 0.5)
        .select(col("doc_id"), col("lang"), col("source"))
    },

    // ----- bloom-prefiltered exact anti-join (blocklist drop) -----
    "p_bloom_antijoin" -> { (s, dir) =>
      val blocked = t(s, dir, "customer")
        .filter(col("c_acctbal") < 0)
        .select(col("c_custkey"))
      graft.ops.BloomJoin.antiJoin(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        "o_custkey",
        blocked,
        "c_custkey")
    },

    // ----- multimodal metadata extraction \u2014 REAL ImageIO decode (r13):
    // each doc stages a deterministic gradient PNG (w = 8 + doc_id%5,
    // h = 8 + doc_id%3), encoded partition-wise by the JDK PNG writer;
    // extractMeta must recover the true dimensions through a real
    // ImageIO.read, hash-gated against the generator's closed form.
    // (n_bytes is the encoder's output size \u2014 real but not relationally
    // replayable, so the gate projects the decoded fields.) The stub
    // fallback path stays gated by m_media_report. -----
    "m_media_meta" -> { (s, dir) =>
      val staged = Multimodal.withPngBlob(
        t(s, dir, "documents").select(col("doc_id")),
        "doc_id",
        lit(8) + col("doc_id") % 5,
        lit(8) + col("doc_id") % 3,
        (col("doc_id") * 7) % 256,
        (col("doc_id") * 11) % 256,
        (col("doc_id") * 13) % 256)
      Multimodal.extractMeta(staged, "doc_id", "blob")
        .select(
          col("doc_id"),
          col("width"),
          col("height"),
          col("n_frames"),
          col("format"))
    },

    // ----- per-pixel channel statistics \u2014 REAL ImageIO decode (r13):
    // the same gradient fixture, but the gate sums every decoded pixel's
    // R/G/B \u2014 a passing hash proves per-pixel decode (gradient + modular
    // wrap), not just header parsing; the oracle replays the closed-form
    // channel sums -----
    "m_image_stats" -> { (s, dir) =>
      val staged = Multimodal.withPngBlob(
        t(s, dir, "documents").select(col("doc_id")),
        "doc_id",
        lit(8) + col("doc_id") % 5,
        lit(8) + col("doc_id") % 3,
        (col("doc_id") * 7) % 256,
        (col("doc_id") * 11) % 256,
        (col("doc_id") * 13) % 256)
      Multimodal.imageStats(staged, "doc_id", "blob")
    },

    // ----- multimodal corpus report (r13: MIXED formats): the per-format
    // "media card" a multimodal shard ships with \u2014 and the gate for the
    // format DISPATCH itself: even doc_ids carry a REAL PNG (ImageIO
    // decode), odd doc_ids carry raw text bytes (the documented stub
    // fallback for JDK-less formats), one relation exercising both
    // decoder paths. One partial-agg'd shuffle over the extractMeta
    // projection; |formats| output rows. (total_bytes is dropped from
    // the gated projection: a real encoder's output size is true but
    // not relationally replayable.) -----
    "m_media_report" -> { (s, dir) =>
      val base = t(s, dir, "documents")
      val pngs = Multimodal.withPngBlob(
        base.filter(col("doc_id") % 2 === 0).select(col("doc_id")),
        "doc_id",
        lit(8) + col("doc_id") % 5,
        lit(8) + col("doc_id") % 3,
        (col("doc_id") * 7) % 256,
        (col("doc_id") * 11) % 256,
        (col("doc_id") * 13) % 256)
      val raws = base
        .filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("text").cast(BinaryType).as("blob"))
      Multimodal.extractMeta(pngs.unionByName(raws), "doc_id", "blob")
        .groupBy(col("format"))
        .agg(
          count(lit(1)).as("n_items"),
          max(col("width")).as("max_width"),
          max(col("height")).as("max_height"),
          sum(col("n_frames").cast(LongType)).as("total_frames"))
    },

    // ----- multimodal frame sampling \u2014 REAL multi-frame decode (r13):
    // each doc stages an ANIMATED GIF with 1 + doc_id%6 frames (encoded
    // partition-wise by the JDK GIF writer); frameSample must recover the
    // true frame count through the real GIF reader and explode every 2nd
    // frame, hash-gated against the generator's range. The byte-derived
    // frame fingerprint stays spec-only \u2014 64-bit overflow wraps on the
    // JVM, errors in DuckDB -----
    "m_frame_sample" -> { (s, dir) =>
      val staged = Multimodal.withGifBlob(
        t(s, dir, "documents").select(col("doc_id")),
        "doc_id",
        lit(1) + col("doc_id") % 6)
      Multimodal.frameSample(staged, "doc_id", "blob", every = 2)
        .select(col("doc_id"), col("frame_idx"))
    },

    // ----- audio statistics \u2014 REAL javax.sound.sampled decode (NEW r13):
    // each doc stages a deterministic PCM16 sawtooth WAV (n = 256 +
    // doc_id%17\u00B732 samples, slope k = 1 + doc_id%9973), encoded
    // partition-wise by the real JDK WAV writer; audioStats must recover
    // the container header AND every sample through a real AudioSystem
    // decode \u2014 \u03A3|sample| cannot be reproduced from header parsing alone.
    // The oracle replays the sawtooth per-sample. Shuffle-free
    // (mapPartitions encode\u2192decode back to back, the m_image_stats
    // posture) -----
    "m_audio_stats" -> { (s, dir) =>
      val staged = Multimodal.withWavBlob(
        t(s, dir, "documents").select(col("doc_id")),
        "doc_id",
        lit(256) + (col("doc_id") % 17) * 32,
        lit(1) + col("doc_id") % 9973)
      Multimodal.audioStats(staged, "doc_id", "blob")
    },

    // ----- video CONTAINER metadata — real ISO-BMFF box walk (NEW r14):
    // each doc stages a structurally-real MP4 (ftyp + moov with mvhd,
    // a video trak carrying 16.16 tkhd dimensions + stsd codec fourcc,
    // doc_id%3 audio traks + mdat), encoded partition-wise; videoMeta
    // must walk the box tree back to exactly the generating parameters
    // (duration via mvhd timescale division, track count, dimensions,
    // codec). Codec-level DECODE stays the documented stub — the JDK has
    // no video codec; the container layer is pure byte arithmetic, the
    // m_audio_stats WAV-header pattern one level up. Shuffle-free -----
    "m_video_meta" -> { (s, dir) =>
      val staged = Multimodal.withMp4Blob(
        t(s, dir, "documents").select(col("doc_id")),
        "doc_id",
        timescale = lit(600) + (col("doc_id") % 5) * 200,
        durationTicks = lit(1000) + col("doc_id") % 50000,
        width = lit(160) + (col("doc_id") % 8) * 40,
        height = lit(120) + (col("doc_id") % 6) * 30,
        codec = element_at(
          array(lit("avc1"), lit("hvc1"), lit("vp09"), lit("av01")),
          (col("doc_id") % 4 + 1).cast(IntegerType)),
        nAudio = col("doc_id") % 3,
        mdatLen = lit(64) + col("doc_id") % 100)
      Multimodal.videoMeta(staged, "doc_id", "blob")
    },

    // ----- WebM/Matroska CONTAINER metadata — real EBML varint walk
    // (NEW r15): each doc stages a structurally-real WebM (EBML header
    // with DocType, Segment(Info(TimestampScale, Duration) + Tracks
    // (video TrackEntry with pixel dims + codec id, doc_id%3 audio
    // entries) + an opaque Cluster)), encoded partition-wise; videoMeta
    // must walk the element tree back to exactly the generating
    // parameters (duration = units x scale_ns // 1e6). The parseMp4
    // pattern one container format over; shuffle-free -----
    "m_webm_meta" -> { (s, dir) =>
      val staged = Multimodal.withWebmBlob(
        t(s, dir, "documents").select(col("doc_id")),
        "doc_id",
        scaleNs = element_at(
          array(lit(250000L), lit(500000L), lit(1000000L), lit(2000000L),
            lit(4000000L)),
          (col("doc_id") % 5 + 1).cast(IntegerType)),
        durationUnits = lit(1000) + col("doc_id") % 50000,
        width = lit(160) + (col("doc_id") % 8) * 40,
        height = lit(120) + (col("doc_id") % 6) * 30,
        codec = element_at(
          array(lit("V_VP8"), lit("V_VP9"), lit("V_AV1")),
          (col("doc_id") % 3 + 1).cast(IntegerType)),
        nAudio = col("doc_id") % 3,
        clusterLen = lit(64) + col("doc_id") % 100)
      Multimodal.videoMeta(staged, "doc_id", "blob")
    },

    // ----- WARC web-archive ingest — the Common Crawl container (NEW
    // r15): each doc stages a structurally-real WARC blob (warcinfo +
    // 1+doc_id%3 HTTP response records; ODD ids as per-record gzip
    // members, the .warc.gz layout), parsed back record-by-record with
    // the HTTP block split into status/content-type/body. Every output
    // field is a closed form of (doc_id, rec_idx), so DuckDB replays the
    // whole parse — including the gzip path, which must be transparent.
    // mapPartitions-only, shuffle-free -----
    "u_warc_ingest" -> { (s, dir) =>
      val staged = graft.ops.Warc.withWarcBlob(
        t(s, dir, "documents").select(col("doc_id")),
        "doc_id",
        nResponses = lit(1) + col("doc_id") % 3)
      graft.ops.Warc.warcIngest(staged, "doc_id", "blob")
    },

    // ----- FILE-scale WARC ingest (NEW r16, the r15 verdict's #1 ask):
    // a real Common Crawl segment is a ~1 GB .warc.gz FILE, far past the
    // blob path's 64 MiB cap. The gate stages a >=256 MiB multi-member
    // .warc.gz (110k records, near-incompressible LCG bodies; REQUIREd
    // >=256 MiB on-wire) plus two small segments (one gz, one plain),
    // STREAMS their records off the file handles (one record in memory
    // at a time), and aggregates per (file, type, idx-bucket) — every
    // aggregate a closed form of (seed, rec_idx) that DuckDB replays
    // independently. The big-file walk runs payload-PRUNED (column
    // pruning pushed into the record walk; lengths/URIs/structure still
    // parse-derived and byte-exact); byte-exact CONTENT is REQUIREd
    // in-gate by replaying one small-segment record against the LCG
    // generator. Fixture staging is memoized on disk per machine -----
    "u_warc_file_ingest" -> { (s, dir) =>
      import s.implicits._
      import graft.ops.Warc
      val big =
        Warc.stagedWarcFile("big", seed = 1L, nResponses = 110000,
          gzip = true)
      val seg =
        Warc.stagedWarcFile("seg", seed = 2L, nResponses = 500, gzip = true)
      val plain =
        Warc.stagedWarcFile("plain", seed = 3L, nResponses = 400,
          gzip = false)
      require(big.length >= (256L << 20),
        s"warc file fixture must be >=256 MiB on-wire, got ${big.length}")
      val probe = Warc.warcIngestFiles(
          Seq(("seg", seg.getPath)).toDF("file_id", "path"), "path")
        .filter(col("rec_idx") === 8)
        .select(col("payload"), col("target_uri"))
        .collect()
      require(probe.length == 1 &&
        probe(0).getString(0) == Warc.fileBody(2L, 7) &&
        probe(0).getString(1) == Warc.fileUri(2L, 7),
        "seg record 8 must round-trip byte-exactly through the file walk")
      val bigRecs = Warc.warcIngestFiles(
        Seq(("big", big.getPath)).toDF("file_id", "path"), "path",
        includePayload = false)
      val smallRecs = Warc.warcIngestFiles(
        Seq(("seg", seg.getPath), ("plain", plain.getPath))
          .toDF("file_id", "path"),
        "path")
      bigRecs.unionByName(smallRecs)
        .groupBy(
          col("file_id"), col("warc_type"),
          (col("rec_idx") % 16).as("bucket"))
        .agg(
          count(lit(1)).as("n_recs"),
          sum(col("payload_len")).as("sum_len"),
          min(col("rec_idx")).as("min_idx"),
          max(col("rec_idx")).as("max_idx"),
          countDistinct(col("target_uri")).as("n_uris"))
    },

    // ----- crawl-to-corpus e2e (NEW r16, the r15 verdict's #3 ask): the
    // e2e family (P36/P45/P91/P139) starts at clean text — this one
    // starts at the ARRIVAL CONTAINER. Chain: stage WARC blobs whose
    // response bodies are HTML-wrapped document text (doc_id%10 docs get
    // an exact duplicate under a shifted id; doc_id%17 bodies carry
    // injected U+FFFD artifacts; odd ids gzip) → warcIngest → stripHtml
    // → encoding-artifact ppm==0 filter (drops the injected docs) →
    // langId → exact dedup keeping the min id per stripped text →
    // per-predicted-lang corpus report. ONE chained DuckDB oracle
    // replays every stage -----
    "p_crawl_e2e" -> { (s, dir) =>
      val body = concat(
        lit("<html><head><title>t</title></head><body><h1>Doc</h1><p>"),
        col("text"),
        when(col("doc_id") % 17 === 0, lit("\uFFFD\uFFFD\uFFFD"))
          .otherwise(lit("")),
        lit("</p></body></html>"))
      val base = t(s, dir, "documents").select(col("doc_id"), body.as("body"))
      val twins = t(s, dir, "documents")
        .filter(col("doc_id") % 10 === 0)
        .select(
          (col("doc_id") + lit(1000000000L)).as("doc_id"), body.as("body"))
      val staged = graft.ops.Warc.withWarcBlobBody(
        base.unionByName(twins), "doc_id", "body")
      val recs = graft.ops.Warc.warcIngest(staged, "doc_id", "blob")
        .filter(col("warc_type") === "response")
      val stripped = recs.select(
        col("doc_id"),
        TextFunctions.stripHtml(col("payload")).as("text2"))
      val clean = stripped
        .filter(TextFunctions.encodingArtifactPpm(col("text2")) === 0L)
      val langed = clean
        .withColumn("pred_lang", TextFunctions.langId(col("text2")))
      // exact dedup + report WITHOUT shuffling text: every report metric
      // is a function of the text, so it is computed map-side per doc
      // and the survivor election shuffles only (fp, metrics) tuples —
      // at 100 TB the dedup exchange carries fixed-width rows, never the
      // corpus payload (corpusReport's own metric definitions, verbatim)
      val perDoc = langed.select(
        col("doc_id"),
        md5(col("text2")).as("__fp"),
        col("pred_lang"),
        coalesce(TextFunctions.tokenCount(col("text2")), lit(0L))
          .cast(org.apache.spark.sql.types.LongType).as("__toks"),
        coalesce(length(col("text2")), lit(0))
          .cast(org.apache.spark.sql.types.LongType).as("__chars"),
        TextFunctions.hash61(coalesce(col("text2"), lit(""))).as("__h"))
      val survivors = perDoc
        .groupBy(col("__fp"))
        .agg(
          min(col("doc_id")).as("doc_id"),
          min(col("pred_lang")).as("pred_lang"),
          min(col("__toks")).as("__toks"),
          min(col("__chars")).as("__chars"),
          min(col("__h")).as("__h"))
      survivors
        .groupBy(col("pred_lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("__toks")).as("n_tokens"),
          sum(col("__chars")).as("n_chars"),
          countDistinct(col("__h")).as("n_distinct_texts"),
          max(col("__toks")).as("max_tokens"),
          (sum(col("__toks")).cast(org.apache.spark.sql.types.DoubleType) /
            count(lit(1)).cast(org.apache.spark.sql.types.DoubleType))
            .as("mean_tokens"))
    },

    // ----- raw robots.txt parsing — the crawl-scope FRONT END (NEW r15):
    // each doc stages a robots.txt body (comments, CRLF line, a
    // before-any-group directive that must be dropped, stacked + mixed-
    // case user-agent lines, an empty Disallow:, a Sitemap: emitted
    // GROUP-INDEPENDENT per RFC 9309 §2.3 — r16, previously dropped);
    // parseRobots must reduce it to exactly the closed-form rule rows,
    // which the oracle derives INDEPENDENTLY (no parse replay - the
    // expected output is a pure closed form of doc_id) -----
    "u_robots_parse" -> { (s, dir) =>
      val nl = lit("\n")
      val txt = concat(
        lit("# fetched "), (col("doc_id") % 11).cast(StringType), nl,
        when(col("doc_id") % 7 === 0, lit("Disallow: /early\n"))
          .otherwise(lit("")),
        lit("User-agent: *\r\n"),
        lit("Disallow: /admin\n"),
        when(col("doc_id") % 2 === 0, lit("Allow: /admin/public\n"))
          .otherwise(lit("")),
        lit("Crawl-delay: "), (lit(1) + col("doc_id") % 5).cast(StringType),
        nl,
        when(col("doc_id") % 5 === 0, lit("Disallow:\n")).otherwise(lit("")),
        nl,
        when(col("doc_id") % 3 === 0,
          concat(
            lit("User-agent: GraftBot\nUser-agent: otherbot\nDISALLOW: /p"),
            (col("doc_id") % 7).cast(StringType), nl)).otherwise(lit("")),
        lit("Sitemap: https://example.invalid/s.xml\n"))
      Urls.parseRobots(
        t(s, dir, "documents").select(col("doc_id"), txt.as("robots")),
        "doc_id",
        "robots")
    },

    // ----- sitemap XML parsing — the crawl front end's other half (NEW
    // r15): doc_id%4=0 docs stage a <sitemapindex> (2 child sitemaps
    // when doc_id%8=0, else 1), the rest a <urlset> (1+doc_id%3 urls
    // with lastmod; the first entry lacks lastmod when doc_id%5=0). The
    // oracle derives the expected rows closed-form, independent of the
    // regex walk -----
    "u_sitemap_parse" -> { (s, dir) =>
      val d = col("doc_id").cast(StringType)
      val dom = concat(lit("https://www.d"),
        (col("doc_id") % 37).cast(StringType), lit(".com"))
      // even docs stage PRETTY-PRINTED xml (newline+indent between and
      // INSIDE entry blocks, whitespace around loc text) — the real-world
      // transport shape the (?s)/trim parse must survive; the oracle is
      // unchanged because values are whitespace-trimmed
      val pp = when(col("doc_id") % 2 === 0, lit("\n  ")).otherwise(lit(""))
      def urlEntry(i: Int) = when(col("doc_id") % 3 >= i - 1,
        concat(
          pp, lit("<url>"), pp, lit("<loc>"), pp, dom, lit("/p"), d,
          lit(s"-${i - 1}"), pp, lit("</loc>"),
          when(col("doc_id") % 5 === 0 && lit(i) === 1, lit(""))
            .otherwise(concat(
              pp, lit("<lastmod>2026-0"),
              (lit(1) + (col("doc_id") + lit(i - 1)) % 9).cast(StringType),
              lit("-01</lastmod>"))),
          pp, lit("<priority>0.5</priority></url>"))).otherwise(lit(""))
      def idxEntry(i: Int) = when(
        if (i == 1) lit(true) else col("doc_id") % 8 === 0,
        concat(pp, lit("<sitemap>"), pp, lit("<loc>"), dom,
          lit(s"/sitemap-${i - 1}.xml</loc>"), pp,
          lit("</sitemap>"))).otherwise(lit(""))
      val xml = when(col("doc_id") % 4 === 0,
        concat(lit("<?xml version=\"1.0\"?>"), pp, lit("<sitemapindex>"),
          idxEntry(1), idxEntry(2), pp, lit("</sitemapindex>")))
        .otherwise(
          concat(lit("<?xml version=\"1.0\"?>"), pp, lit("<urlset>"),
            urlEntry(1), urlEntry(2), urlEntry(3), pp, lit("</urlset>")))
      Urls.parseSitemap(
        t(s, dir, "documents").select(col("doc_id"), xml.as("xml")),
        "doc_id",
        "xml")
    },

    // ----- crawl frontier e2e (NEW r16, the r15 verdict's robots→sitemap
    // seam): robots bodies carry Sitemap: directives (1 + doc_id%2 per
    // doc) → parseRobots surfaces them group-independent → the sitemap
    // URLs join to a staged body table keyed by the SAME closed-form URL
    // → parseSitemapBlobs (half the bodies ship as .xml.gz — the
    // dominant transport — and doc_id%50=0 stages a TRUNCATED gzip that
    // must classify sitemap-corrupt) → one frontier row per url entry.
    // The oracle derives every row closed-form, independent of both
    // parsers and of the gzip round-trip -----
    "u_crawl_frontier_e2e" -> { (s, dir) =>
      val m = (col("doc_id") % 37).cast(StringType)
      val d = col("doc_id").cast(StringType)
      def smUrl(j: Column) = concat(
        lit("https://www.d"), m, lit(".com/s"), d, lit("-"),
        j.cast(StringType), lit(".xml"))
      val robots = t(s, dir, "documents").select(
        col("doc_id"),
        concat(
          lit("User-agent: *\nDisallow: /admin\n"),
          lit("Sitemap: "), smUrl(lit(0)), lit("\n"),
          when(col("doc_id") % 2 === 1,
            concat(lit("Sitemap: "), smUrl(lit(1)), lit("\n")))
            .otherwise(lit(""))).as("robots"))
      val smUrls = Urls.parseRobots(robots, "doc_id", "robots")
        .filter(col("rule") === "sitemap")
        .select(col("value").as("sitemap_url"))
      def entry(j: Int, k: Int) = when((col("doc_id") + j) % 3 >= k,
        concat(
          lit("<url><loc>https://www.d"), m, lit(".com/p"), d,
          lit(s"-$j-$k</loc><lastmod>2026-0"),
          (lit(1) + (col("doc_id") + lit(j + k)) % 9).cast(StringType),
          lit("-01</lastmod></url>"))).otherwise(lit(""))
      def xmlFor(j: Int) = concat(
        lit("<?xml version=\"1.0\"?><urlset>"),
        entry(j, 0), entry(j, 1), entry(j, 2), lit("</urlset>"))
      def bodiesAt(j: Int) = t(s, dir, "documents")
        .filter(if (j == 0) lit(true) else col("doc_id") % 2 === 1)
        .select(
          col("doc_id"), lit(j).as("j"),
          smUrl(lit(j)).as("sitemap_url"), xmlFor(j).as("xml"))
      val blobs = Urls
        .withSitemapBlob(
          bodiesAt(0).unionByName(bodiesAt(1)),
          "xml",
          gzip = (col("doc_id") + col("j")) % 2 === 0)
        .withColumn(
          "blob",
          when(col("doc_id") % 50 === 0 && col("j") === 0,
            substring(col("blob"), 1, 10)) // truncated gzip: corrupt
            .otherwise(col("blob")))
        .select(col("sitemap_url"), col("blob"))
      val frontier = smUrls.join(blobs, Seq("sitemap_url"))
      Urls.parseSitemapBlobs(frontier, "sitemap_url", "blob")
    },

    // ----- URL curation (P39) -----
    // over a url column derived deterministically from doc_id/source/lang
    // (documents has no url field); the oracle builds the identical string
    "u_canonical" -> { (s, dir) =>
      withUrl(t(s, dir, "documents")).select(
        col("doc_id"),
        Urls.urlHost(col("url")).as("host"),
        Urls.urlDomain(col("url")).as("domain"),
        Urls.canonicalizeUrl(col("url")).as("url_canon"))
    },
    "u_domain_cap" -> { (s, dir) =>
      Urls
        .capPerDomain(withUrl(t(s, dir, "documents")), "doc_id", "url", k = 3)
        .select(col("doc_id"), col("domain"))
    },

    // ----- outlink extraction (NEW r10): href harvesting from HTML
    // payloads \u2192 registered-domain link report. Fixture wraps each doc's
    // text in markup with two deterministic anchors (a co.uk PSL case and
    // a subdomained .com); the report is the inlink-count table a crawl
    // scheduler / host-authority pipeline starts from -----
    "u_outlinks" -> { (s, dir) =>
      val url1 = concat(
        lit("https://www.d"), (col("doc_id") % 37).cast(StringType),
        lit(".co.uk/p"), col("doc_id").cast(StringType))
      val url2 = concat(
        lit("http://blog.d"), (col("doc_id") % 41).cast(StringType),
        lit(".com/q?id="), col("doc_id").cast(StringType))
      val html = concat(
        lit("<p>"), col("text"), lit("</p><a href=\""), url1,
        lit("\">x</a> <nav><a href=\""), url2, lit("\">y</a></nav>"))
      t(s, dir, "documents")
        .select(col("doc_id"), html.as("html"))
        .select(
          col("doc_id"),
          explode(Urls.extractLinks(col("html"))).as("url"))
        .groupBy(Urls.urlDomain(col("url")).as("domain"))
        .agg(
          count(lit(1)).as("n_links"),
          countDistinct(col("doc_id")).as("n_docs"))
    },
    // ----- robots-style disallow filter (NEW r10): (domain, path-prefix)
    // rules drop matching urls via a broadcast anti-join; fixture: /admin
    // paths on every 4th doc, rules disallow /admin on domains d0..d9 -----
    "u_robots_filter" -> { (s, dir) =>
      import s.implicits._
      val urls = t(s, dir, "documents").select(
        col("doc_id"),
        concat(
          lit("https://www.d"), (col("doc_id") % 25).cast(StringType),
          lit(".com"),
          when(col("doc_id") % 4 === 0, lit("/admin/p"))
            .otherwise(lit("/p")),
          col("doc_id").cast(StringType)).as("url"))
      val rules = (0 until 10)
        .map(k => (s"d$k.com", "/admin"))
        .toDF("rule_domain", "rule_prefix")
      Urls.dropDisallowed(urls, "url", rules, "rule_domain", "rule_prefix")
    },

    // ----- robots.txt DECISION engine (NEW r11): RFC 9309 longest-match
    // precedence \u2014 agent-specific groups REPLACE the '*' group entirely
    // (d0-d4 for graftbot), a longer allow overrides a shorter disallow
    // (/admin/tools under disallow /admin), and an exact-length tie goes
    // to allow (d6's allow+disallow /admin). r16: the decision now
    // carries the TYPED politeness rate \u2014 crawlDelayMs reduces the same
    // rule relation to exact integer ms under the same group
    // exclusivity (d2-d4's '*' delays DEAD, d7's non-numeric dropped),
    // 0 where no delay is registered -----
    "u_robots_decisions" -> { (s, dir) =>
      import s.implicits._
      val urls = t(s, dir, "documents").select(
        col("doc_id"),
        concat(
          lit("https://www.d"), (col("doc_id") % 25).cast(StringType),
          lit(".com"),
          when(col("doc_id") % 8 === 0, lit("/admin/tools/p"))
            .when(col("doc_id") % 4 === 0, lit("/admin/p"))
            .otherwise(lit("/public/p")),
          col("doc_id").cast(StringType)).as("url"))
      val rules = RobotsRules.toDF("rule_domain", "agent", "rule", "prefix")
      val dec =
        Urls.robotsDecisions(urls, "doc_id", "url", rules, agent = "graftbot")
      val delays = Urls
        .crawlDelayMs(rules, agent = "graftbot", valueCol = "prefix")
        .withColumnRenamed("rule_domain", "__delay_domain")
      dec
        .join(
          broadcast(delays), col("domain") === col("__delay_domain"), "left")
        .withColumn(
          "crawl_delay_ms", coalesce(col("crawl_delay_ms"), lit(0L)))
        .drop("__delay_domain")
    },

    // ----- politeness fetch partitioning (NEW r10): each domain's urls
    // spread round-robin over 4 fetch slots in a deterministic hash
    // order \u2014 balance per (domain, slot) is asserted in the spec -----
    "u_fetch_slots" -> { (s, dir) =>
      Urls.fetchSlots(
        t(s, dir, "documents").select(
          col("doc_id"),
          concat(
            lit("https://www.d"), (col("doc_id") % 25).cast(StringType),
            lit(".com/p"), col("doc_id").cast(StringType)).as("url")),
        "doc_id",
        "url",
        slots = 4)
    },
    "u_domain_block" -> { (s, dir) =>
      val u = withUrl(t(s, dir, "documents"))
      // r17: cached — the blocklist is a corpus-wide domain extract that
      // BloomJoin consumes three times (sizing count, Bloom aggregate,
      // exact-join build); uncached, the regex domain parse + distinct
      // re-ran per consumer. Measured 2.10 -> 1.8 s at sf0.1 local[32].
      val blocked = graft.ops.Par.cached(u
        .select(Urls.urlDomain(col("url")).as("dom"))
        .filter(col("dom").endsWith(".io"))
        .distinct())
      Urls.dropBlockedDomains(u, "url", blocked, "dom")
    },
    "u_url_dedup" -> { (s, dir) =>
      Urls
        .dedupByCanonicalUrl(
          withDupUrl(t(s, dir, "documents")),
          "doc_id",
          "url")
        .select(col("doc_id"), col("url_canon"))
    },

    // ----- IVF ANN end-to-end (rows-only: k-means training + nprobe
    // search compose FP sums that cannot hash-match cross-engine; the
    // map-side assignment math is hash-gated separately as s_ivf_assign).
    // r15: the gate now carries ALGORITHMIC signal beyond shape — recall@5
    // vs the in-gate brute-force truth is REQUIRED above a measured floor
    // (the P138/P141 audited-sketch pattern): a recall regression fails
    // the driver run, not just a shape change. Measured 0.67/0.63/0.68 at
    // sf0.001/0.01/0.1 (probing 3 of 8 cells), floor pinned with margin.
    "s_ivf_topk" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") < 50)
      // r16: cached — the in-gate recall floor fully evaluates ann once
      // and the sink evaluates it again; uncached, the whole IVF pipeline
      // (training included) ran twice per timed pass.
      val ann = graft.ops.Par.cached(Similarity.ivfTopK(
        emb,
        "vec_id",
        "embedding",
        qs,
        "vec_id",
        "embedding",
        k = 5,
        cells = 8,
        nprobe = 3,
        trainIters = 2))
      val truth = Similarity.bruteForceTopK(
        emb, "vec_id", "embedding", qs, "vec_id", "embedding", k = 5)
      val rec = graft.ops.AnnEval
        .recallAtK(ann, truth, "query_id", "neighbor_id")
        .agg(sum(col("n_hits")).as("h"), sum(col("n_truth")).as("t"))
        .collect().head
      val recall = rec.getLong(0).toDouble / rec.getLong(1)
      require(recall >= 0.55,
        f"s_ivf_topk recall@5 = $recall%.3f fell below the 0.55 floor " +
          "(measured 0.63-0.68 across sf0.001..0.1) - ANN quality regressed")
      ann
    },

    // ----- integer-exact IVF (P73): the WHOLE pipeline \u2014 quantization,
    // seeded k-means training, assignment, probe, ranking \u2014 in exact
    // integer / correctly-rounded-double arithmetic, so unlike s_ivf_topk
    // the training itself hash-matches a DuckDB replay of the unrolled
    // iterations -----
    "s_ivf_int_centroids" -> { (s, dir) =>
      IvfInt.trainedCentroids(
        t(s, dir, "embeddings"),
        "vec_id",
        "embedding",
        cells = IvfIntCells,
        iters = IvfIntIters)
    },
    "s_ivf_int_topk" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      IvfInt.topK(
        emb,
        "vec_id",
        "embedding",
        emb.filter(col("vec_id") < IvfIntNQueries),
        "vec_id",
        "embedding",
        k = IvfIntK,
        cells = IvfIntCells,
        nprobe = IvfIntNprobe,
        iters = IvfIntIters)
    },

    // ----- product quantization (P74): per-subspace integer k-means
    // codebooks + ADC search \u2014 NO floating point anywhere (assignment is
    // exact-long `2\u00B7dot \u2212 \u2016c\u2016\u00B2`), so training AND search hash-match the
    // unrolled DuckDB replay -----
    "s_pq_codebooks" -> { (s, dir) =>
      Pq.trainedCodebooks(
        t(s, dir, "embeddings"),
        "vec_id",
        "embedding",
        m = PqM,
        cells = PqCells,
        iters = PqIters)
    },
    "s_pq_topk" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Pq.adcTopK(
        emb,
        "vec_id",
        "embedding",
        emb.filter(col("vec_id") < PqNQueries),
        "vec_id",
        "embedding",
        k = PqK,
        m = PqM,
        cells = PqCells,
        iters = PqIters)
    },

    // ----- web-curation composition gate (P45): the URL-level pipeline
    // chained end-to-end \u2014 canonical-url dedup \u2192 per-domain cap \u2192 token
    // quality gate \u2192 token-budget cut \u2014 against ONE chained oracle (the
    // P36 pattern for the r8 URL operators)
    "p_web_curation_e2e" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      webCurationChain(
        withDupUrl(docs), docs, k = 3, budget = 3000L,
        score = col("n_chars"))
        .result
        .select(col("doc_id"), col("cum_tokens"))
    },

    // ----- count-min sketch estimates (P44) -----
    "t_cms_counts" -> { (s, dir) =>
      import s.implicits._
      val words = t(s, dir, "documents")
        .select(explode(TextFunctions.words(col("text"))).as("w"))
      val sk = graft.ops.CountMin.sketch(words, col("w"), width = 1024, depth = 3)
      val probe =
        Seq("the", "a", "spark", "table", "hash", "zzz_nothere").toDF("w")
      graft.ops.CountMin.estimates(sk, probe, "w", width = 1024, depth = 3)
    },

    // ----- LSH bucket assignment (P6 \u2014 the blocking step of lshTopK) -----
    // the fixed-dim (hoisted-signs) variant: the production path since r9;
    // bit-identical to the runtime variant (spec'd), oracle unchanged
    "s_lsh_bucket" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      emb.select(
        col("vec_id"),
        Similarity
          .lshBucketFixedDim(
            col("embedding"), planes = 8, Similarity.vecDim(emb, "embedding"))
          .as("bucket"))
    },

    // ----- PII redaction + C4 line filter (P14) -----
    // over text derived deterministically from doc_id/source/lang: the
    // synthetic documents carry no emails/IPs/newlines, so the fixtures
    // inject them the same way in Spark and the oracle (the withUrl trick)
    "t_pii_redact" -> { (s, dir) =>
      val d = col("doc_id")
      val pii = concat(
        lit("Contact "),
        col("source"),
        lit("@"),
        col("lang"),
        lit("mail.com or 10.0."),
        (d % 256).cast(StringType),
        lit("."),
        (d % 100).cast(StringType),
        lit(" call +1 555 "),
        (d % 900 + 100).cast(StringType),
        lit(" "),
        (d % 9000 + 1000).cast(StringType),
        lit(" now"))
      t(s, dir, "documents").select(
        col("doc_id"),
        TextFunctions.redactPii(pii).as("redacted"))
    },
    // SQuAD-style answer normalization over a derived fixture (synthetic
    // docs carry no punctuation, so the gate injects case, punctuation and
    // articles identically on both sides)
    "t_norm_answer" -> { (s, dir) =>
      val d = col("doc_id")
      val raw = concat(
        lit("The Answer: "),
        upper(substring(col("text"), 1, 40)),
        lit(", an (extra) word; THE end #"),
        (d % 10).cast(StringType),
        lit("!"))
      t(s, dir, "documents").select(
        col("doc_id"),
        TextFunctions.normalizeAnswer(raw).as("norm"))
    },

    // ----- Unicode NFC canonicalization (NEW r10): synthetic docs are
    // ASCII, so the gate DECOMPOSES them first (each 'e' \u2192 'e'+U+0301, a
    // combining acute) and normalization must recompose to the single
    // code point '\u00E9' \u2014 length shrinks by exactly the injection count.
    // Both sides inject identically; DuckDB's nfc_normalize is the oracle
    // for the native codegen NfcNormalizeF -----
    "t_nfc_norm" -> { (s, dir) =>
      val decomposed = regexp_replace(col("text"), "e", "e\u0301")
      val norm = TextFunctions.nfcNormalize(decomposed)
      t(s, dir, "documents").select(
        col("doc_id"),
        length(decomposed).as("n_decomposed"),
        length(norm).as("n_composed"),
        TextFunctions.hash61(norm).as("norm_hash"))
    },

    // ----- frequency-ranked vocabulary with coverage accounting (NEW
    // r10): the tokenizer-design precursor \u2014 what OOV rate does a V-word
    // vocab buy on this corpus? -----
    "t_vocab_topk" -> { (s, dir) =>
      graft.ops.Vocab.vocabulary(
        t(s, dir, "documents"), "text", minCount = 2L, topV = 200)
    },

    // ----- code-vs-prose routing signals (NEW r10): every third doc gets
    // a synthetic code prelude; the integer ppm signals + the fixed
    // threshold decision must route it to the code side -----
    "t_code_detect" -> { (s, dir) =>
      val d = col("doc_id")
      val body = when(
        d % 3 === 0,
        concat(
          lit("def f(x):\n  return (x + 1);\n  if x { y = z[0]; }\n" +
            "  import os\n"),
          substring(col("text"), 1, 40)))
        .otherwise(col("text"))
      t(s, dir, "documents").select(
        col("doc_id"),
        TextFunctions.codeSymbolPpm(body).as("symbol_ppm"),
        TextFunctions.codeIndentPpm(body).as("indent_ppm"),
        TextFunctions.codeKeywordHits(body).as("kw_hits"),
        TextFunctions.isCode(body).as("is_code"))
    },

    // ----- HTML boilerplate stripping (NEW r10): script/style blocks
    // dropped with content, tags stripped, entities decoded (&amp; last \u2014
    // double-escape rule), whitespace collapsed; fixture wraps each doc
    // in a synthetic page with entity traps -----
    "t_strip_html" -> { (s, dir) =>
      val d = col("doc_id")
      val html = concat(
        lit("<html><head><style>body { color: red; }</style>" +
          "<script type=\"text/javascript\">var x = 1 < 2;</script>" +
          "</head><body><h1 class=\"t\">Title "),
        (d % 7).cast(StringType),
        lit("</h1><p>"),
        substring(col("text"), 1, 60),
        lit(" &amp; more &lt;tags&gt; &quot;q&quot; " +
          "&#39;s&#39;&nbsp;end&amp;lt;</p><br/></body></html>"))
      t(s, dir, "documents").select(
        col("doc_id"),
        TextFunctions.stripHtml(html).as("stripped"))
    },

    // ----- sentence segmentation (NEW r10): split AFTER terminal punct
    // (+ optional closing quote/bracket); trailing unpunctuated text is
    // its own sentence; marker-based (RE2 has no lookbehind) -----
    "t_sentences" -> { (s, dir) =>
      val stext = concat(
        lit("First bit "),
        substring(col("text"), 1, 30),
        lit(". Second part! Is this three? \"Quoted one.\" tail no punct"))
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          posexplode(TextFunctions.sentences(stext))
            .as(Seq("sentence_idx", "sentence")))
    },

    // ----- unigram-LM tokenizer (NEW r11): SentencePiece-style trainer +
    // Viterbi encoder with integer-scaled costs. Three gates:
    //   t_unigram_vocab   \u2014 LIVE distributed training must reproduce the
    //                       frozen constant (end-to-end training
    //                       determinism, driver-gated);
    //   t_unigram_encode  \u2014 frozen-vocab Viterbi segmentation vs the
    //                       unrolled DuckDB DP replay (the P73 pattern);
    //   t_unigram_fertility \u2014 tokens-per-word vs the frozen BPE on the
    //                       same words, per language (the comparison that
    //                       picks a tokenizer family for a corpus). -----
    "t_unigram_vocab" -> { (s, dir) =>
      val vocab = graft.ops.Unigram.train(
        t(s, dir, "documents"),
        "text",
        graft.ops.Unigram.FrozenVocabSize)
      import s.implicits._
      vocab.toDF("piece", "cost")
    },
    "t_unigram_encode" -> { (s, dir) =>
      unigramWordsDf(s, dir)
        .select(
          col("doc_id"),
          col("word_idx"),
          posexplode(
            graft.ops.Unigram.wordPieces(col("w"), graft.ops.Unigram.Frozen))
            .as(Seq("piece_idx", "piece")))
    },

    // ----- WordPiece greedy encode (NEW r11): the third production
    // subword family (BERT longest-match-first, ## continuations,
    // all-or-nothing [UNK]) next to BPE merges and unigram Viterbi \u2014
    // frozen a-z+planted-pieces vocab. The corpus words are pure alpha,
    // so one digit-bearing word per doc (word_idx -1, 'x'||doc_id) is
    // injected on BOTH sides: its head matches but the first digit
    // dead-ends, pinning the all-or-nothing [UNK] path hash-exact -----
    "t_wordpiece" -> { (s, dir) =>
      val extra = t(s, dir, "documents").select(
        col("doc_id"),
        lit(-1).cast(IntegerType).as("word_idx"),
        concat(lit("x"), col("doc_id").cast(StringType)).as("w"))
      unigramWordsDf(s, dir)
        .select(col("doc_id"), col("word_idx"), col("w"))
        .union(extra)
        .select(
          col("doc_id"),
          col("word_idx"),
          posexplode(
            graft.ops.WordPiece.wordPieces(
              col("w"), graft.ops.WordPiece.Frozen))
            .as(Seq("piece_idx", "piece")))
    },
    "t_unigram_fertility" -> { (s, dir) =>
      val bpeLen = udf { (w: String) =>
        if (w == null) 0
        else graft.ops.Bpe.encodeWordOrdered(w, graft.ops.Bpe.Frozen).length
      }
      unigramWordsDf(s, dir)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("total_words"),
          sum(size(graft.ops.Unigram
            .wordPieces(col("w"), graft.ops.Unigram.Frozen)).cast(LongType))
            .as("total_unigram"),
          sum(bpeLen(col("w")).cast(LongType)).as("total_bpe"))
        .withColumn(
          "unigram_fertility_ppm",
          Sampling.divFloor(col("total_unigram") * 1000000L, col("total_words")))
        .withColumn(
          "bpe_fertility_ppm",
          Sampling.divFloor(col("total_bpe") * 1000000L, col("total_words")))
    },

    // ----- WordPiece fertility (NEW r11): the triad-completing
    // tokens-per-word comparison \u2014 greedy WordPiece vs the frozen BPE on
    // the same words, per language ([UNK] counts as 1 token: the
    // all-or-nothing collapse UNDER-counts vs its char spell-out, which
    // is exactly the coverage-gap signal this report surfaces) -----
    "t_wordpiece_fertility" -> { (s, dir) =>
      val bpeLen = udf { (w: String) =>
        if (w == null) 0
        else graft.ops.Bpe.encodeWordOrdered(w, graft.ops.Bpe.Frozen).length
      }
      unigramWordsDf(s, dir)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("total_words"),
          sum(size(graft.ops.WordPiece
            .wordPieces(col("w"), graft.ops.WordPiece.Frozen))
            .cast(LongType)).as("total_wordpiece"),
          sum(bpeLen(col("w")).cast(LongType)).as("total_bpe"))
        .withColumn(
          "wordpiece_fertility_ppm",
          Sampling.divFloor(
            col("total_wordpiece") * 1000000L, col("total_words")))
        .withColumn(
          "bpe_fertility_ppm",
          Sampling.divFloor(col("total_bpe") * 1000000L, col("total_words")))
    },

    // ----- adversarial regex-subset fuzz (NEW r11): the same two ops over
    // the generated 1000-doc adversarial corpus (see HtmlFuzzFrags /
    // SentenceFuzzFrags) \u2014 Java regex and RE2 must agree byte-for-byte on
    // nested/unterminated/attribute-trap markup and on decimal-period /
    // quote-bracket sentence traps, or the hash fails -----
    "t_strip_html_fuzz" -> { (s, dir) =>
      fuzzDocsDf(s, HtmlFuzzFrags).select(
        col("doc_id"),
        TextFunctions.stripHtml(col("txt")).as("stripped"))
    },
    "t_sentences_fuzz" -> { (s, dir) =>
      fuzzDocsDf(s, SentenceFuzzFrags).select(
        col("doc_id"),
        posexplode(TextFunctions.sentences(col("txt")))
          .as(Seq("sentence_idx", "sentence")))
    },

    // ----- r11 second fuzz pass: the remaining three regex-subset text
    // ops (normalizeAnswer, scripts, mojibake) over their own generated
    // adversarial corpora \u2014 completing the discipline sweep the verdict
    // named (stripHtml, sentences, normalizeAnswer, scripts, mojibake) -----
    "t_norm_answer_fuzz" -> { (s, dir) =>
      fuzzDocsDf(s, NormFuzzFrags).select(
        col("doc_id"),
        TextFunctions.normalizeAnswer(col("txt")).as("norm"))
    },

    // ----- card-candidate fuzz (NEW r11): per-candidate extraction order
    // AND checksum verdict over digit-run shapes that stress the
    // leftmost-greedy \d{13,19} agreement (over-length splits, fused
    // cards, separator breaks, 12/13/19/20 boundaries, all-zero valid) --
    "t_card_fuzz" -> { (s, dir) =>
      fuzzDocsDf(s, CardFuzzFrags)
        .select(
          col("doc_id"),
          posexplode(TextFunctions.cardCandidates(col("txt")))
            .as(Seq("cand_idx", "cand")))
        .select(
          col("doc_id"),
          col("cand_idx"),
          col("cand"),
          when(TextFunctions.luhnValid(col("cand")), 1L).otherwise(0L)
            .as("luhn_ok"))
    },
    "t_scripts_fuzz" -> { (s, dir) =>
      val base = fuzzDocsDf(s, ScriptFuzzFrags).select(
        col("doc_id") +:
          TextFunctions.ScriptClasses.map { case (name, _) =>
            TextFunctions.scriptPpm(col("txt"), name).as(s"${name}_ppm")
          }: _*)
      val maxPpm = greatest(
        TextFunctions.ScriptClasses.map(c => col(s"${c._1}_ppm")): _*)
      val dominant = TextFunctions.ScriptClasses
        .foldRight(lit("none")) { case ((name, _), elseCol) =>
          when(col(s"${name}_ppm") === maxPpm && maxPpm > 0, lit(name))
            .otherwise(elseCol)
        }
      base.withColumn("dominant", dominant)
    },
    "t_mojibake_fuzz" -> { (s, dir) =>
      fuzzDocsDf(s, MojibakeFuzzFrags)
        .select(
          col("doc_id"),
          TextFunctions.replacementCharCount(col("txt")).as("n_replacement"),
          TextFunctions.c1ControlCount(col("txt")).as("n_c1"),
          TextFunctions.mojibakeSeqCount(col("txt")).as("n_moji"),
          TextFunctions.encodingArtifactPpm(col("txt")).as("artifact_ppm"))
        .withColumn(
          "clean",
          col("n_replacement") + col("n_c1") + col("n_moji") === 0L)
    },

    // ----- confusable-skeleton fuzz (NEW r13): 1000 adversarial docs
    // mixing homoglyph runs, fullwidth forms, in-word zero-widths, and
    // non-confusable Unicode that must pass through untouched — the
    // skeleton hash and the stripped-char count must agree with DuckDB
    // replaying the identical translate from the shared constants -----
    "t_confusables_fuzz" -> { (s, dir) =>
      val skel = TextFunctions.confusableSkeleton(col("txt"))
      fuzzDocsDf(s, ConfusableFuzzFrags)
        .select(
          col("doc_id"),
          TextFunctions.hashMod(skel).as("skel_fp"),
          (length(col("txt")) - length(skel)).as("n_stripped"))
    },

    // ----- per-language OOV accounting against the top-100 corpus vocab
    // (NEW r10): the report that sizes a tokenizer vocab and flags
    // underserved languages -----
    "t_oov_report" -> { (s, dir) =>
      graft.ops.Vocab.oovReport(
        t(s, dir, "documents"), "text", "lang", minCount = 2L, topV = 100)
    },

    // ----- PMI collocations, exact-integer ranked (NEW r10): bigram
    // phrase mining for tokenizer merges / boilerplate spotting; the PMI
    // ordering is replayed as the exact rational c_xy\u00B7N\u00B710\u2076/(c_x\u00B7c_y) in
    // DECIMAL(38,0) \u2014 no float log anywhere -----
    "t_pmi_bigrams" -> { (s, dir) =>
      graft.ops.Vocab.pmiBigrams(
        t(s, dir, "documents"), "text", minCount = 5L, topP = 100)
    },

    // streaming twin of exact dedup: the same keep-min-per-content
    // aggregation as a Structured Streaming query (file source, complete
    // mode, AvailableNow) \u2014 the q_stream_events_hourly pattern applied to
    // the dedup family, gated by the batch relational oracle
    "p_stream_exact_dedup" -> { (s, dir) =>
      graft.ops.Par.withShufflePartitions(s, 8) {
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val agg = s.readStream
        .schema(schema)
        .parquet(s"$dir/documents*.parquet")
        .groupBy(md5(col("text")).as("content_md5"))
        .agg(
          min(col("doc_id")).as("doc_id_kept"),
          count(lit(1)).as("n_copies"))
      val sinkName = "p_stream_exact_dedup_out"
      val q = agg.writeStream
        .format("memory")
        .queryName(sinkName)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(sinkName)
    }},

    // ----- streaming LSH near-dup dedup (NEW r13): the STREAM builds the
    // band-bucket registry (min doc id + member count per bucket \u2014 state
    // proportional to corpus distinctness, never to pairs), then a batch
    // join-back flags each banded document: survived \u21D4 it is the minimum
    // id in EVERY bucket it belongs to. Same minhash constants as
    // p_minhash_lsh, so the oracle replays registry AND verdicts exactly
    // (dedup-on-ingest, the streaming sibling of the batch LSH pipeline)
    "p_stream_lsh_dedup" -> { (s, dir) =>
      graft.ops.Par.withShufflePartitions(s, 8) {
        val schema = s.read.parquet(s"$dir/documents.parquet").schema
        val stream = s.readStream
          .schema(schema)
          .parquet(s"$dir/documents*.parquet")
        val sinkName = "p_stream_lsh_registry_out"
        val q = Dedup.streamingLshRegistry(stream, "doc_id", "text")
          .writeStream
          .format("memory")
          .queryName(sinkName)
          .outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val registry = s.table(sinkName)
        Dedup.lshBandKeys(t(s, dir, "documents"), "doc_id", "text")
          .join(registry, Seq("band", "band_key"))
          .groupBy(col("id"))
          .agg(
            count(lit(1)).as("n_bands"),
            min(col("min_id")).as("smallest_neighbor"))
          .select(
            col("id").as("doc_id"),
            col("n_bands"),
            col("smallest_neighbor"),
            (col("smallest_neighbor") === col("id")).as("survived"))
      }
    },

    "t_line_filter" -> { (s, dir) =>
      val d = col("doc_id")
      val multiline = concat(
        lit("This is a proper sentence.\nok\nno terminal punct here\n"),
        when(d % 2 === 0, lit("Another good line stays!"))
          .otherwise(lit("too short.")),
        lit("\nFinal words for doc "),
        d.cast(StringType),
        lit(" right?"))
      t(s, dir, "documents").select(
        col("doc_id"),
        TextFunctions.keepQualityLines(multiline, minWords = 3).as("kept"))
    },

    // ----- z-order layout key (P43) -----
    "t_zorder" -> { (s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        graft.ops.ZOrder
          .zValue2(col("o_custkey"), col("o_orderkey"), bits = 21)
          .as("zval"))
    },

    // ----- balanced output sharding (P42) -----
    // ----- shard manifest (NEW r10): per-shard write-audit \u2014 count, total
    // weight, and a membership fingerprint that changes iff the shard's
    // id set changes (diff two manifests after a corpus refresh) -----
    "t_shard_manifest" -> { (s, dir) =>
      val sharded = graft.ops.Packing.balancedShards(
        t(s, dir, "documents"), "doc_id", col("n_chars"), nShards = 8)
      graft.ops.Packing.shardManifest(
        sharded, "shard", "doc_id", col("n_chars"))
    },

    "t_balanced_shards" -> { (s, dir) =>
      graft.ops.Packing
        .balancedShards(
          t(s, dir, "documents"),
          "doc_id",
          col("n_chars"),
          nShards = 8)
        .select(col("doc_id"), col("shard"))
    },

    // ----- cluster-balanced subset selection: IVF cell assignment \u2192
    // exact per-cell quota (diversity-preserving downsampling: every
    // region of embedding space keeps k representatives, instead of the
    // dominant cluster swamping a uniform sample) -----
    "s_cluster_sample" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val centroids = emb
        .filter(col("vec_id") < 4)
        .orderBy(col("vec_id"))
        .select(col("embedding"))
        .collect()
        .map(_.getSeq[Float](0).toArray)
      graft.ops.Sampling.quotaSample(
        Similarity.ivfAssign(emb, "vec_id", "embedding", centroids),
        "vec_id",
        k = 40,
        strataCols = Seq("cell"))
    },

    // ----- Johnson-Lindenstrauss random-sign projection to 4 dims (the
    // hash-gateable dim-reduction complement of the float-bound PCA) -----
    "s_jl_project" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val dim = Similarity.vecDim(emb, "embedding")
      val comps = Similarity.jlComponents(col("embedding"), 4, dim)
      emb.select(
        col("vec_id") +: comps.zipWithIndex.map { case (c, i) =>
          c.as(s"y$i")
        }: _*)
    },

    // ----- semantic decontamination: corpus vectors within cos >= 3/10 of
    // any benchmark vector (the paraphrase leakage n-grams miss) -----
    "s_semantic_decontaminate" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      graft.ops.Decontaminate.semanticOverlap(
        emb.filter(col("vec_id") % 50 =!= 0),
        "vec_id",
        "embedding",
        emb.filter(col("vec_id") % 50 === 0),
        "vec_id",
        "embedding",
        thresholdNum = 3L,
        thresholdDen = 10L)
    },

    // ----- exact-integer centroid outlier flags (per label, cos < 1/10) -----
    "s_centroid_outliers" -> { (s, dir) =>
      graft.ops.Outliers.centroidOutliers(
        t(s, dir, "embeddings"),
        "vec_id",
        "embedding",
        groupCols = Seq("label"),
        thresholdNum = 1L,
        thresholdDen = 10L)
    },

    // ----- int8 embedding quantization (P40) -----
    "s_quantize_int8" -> { (s, dir) =>
      Quantize
        .quantize(t(s, dir, "embeddings"), "vec_id", "embedding")
        .select(
          col("vec_id"),
          col("scale"),
          size(filter(col("q"), v => abs(v) === 127)).as("n_sat"),
          aggregate(col("q"), lit(0L), (a, x) => a + x.cast(LongType))
            .as("sum_q"),
          aggregate(col("q"), lit(0L), (a, x) => a + abs(x.cast(LongType)))
            .as("sum_abs_q"))
    },
    // ----- sign-quantized (1-bit) Hamming top-k (NEW r13): the 32\u00D7
    // memory-scale extreme of the quantization ladder. Sign bits are
    // exact float properties (no rounding mode), so unlike float-trained
    // ANN this hash-gates bit-for-bit. Shape: s_quant_topk's \u2014 queries
    // broadcast, corpus scores map-side, WindowGroupLimit bounds the
    // per-query exchange -----
    "s_sign_hamming" -> { (s, dir) =>
      val packed = graft.ops.Par.cached(
        t(s, dir, "embeddings").select(
          col("vec_id"),
          Quantize.signPack(col("embedding"), 64).as("sig")))
      val queries = packed.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("sig").as("qsig"))
      val scored = packed
        .join(broadcast(queries), col("vec_id") =!= col("query_id"))
        .select(
          col("query_id"), col("vec_id"),
          Quantize.hamming(col("sig"), col("qsig")).as("dist"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("dist"), col("vec_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("query_id"), col("rank"), col("vec_id"), col("dist"))
    },

    "s_quant_topk" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Quantize.quantizedTopK(
        emb,
        "vec_id",
        "embedding",
        emb.filter(col("vec_id") < 100),
        "vec_id",
        "embedding",
        k = 5)
    },

    // ----- mutual nearest-neighbor mining (NEW r11): bitext-style pair
    // alignment between the even- and odd-id halves of the embedding
    // corpus \u2014 (a, b) survives only when each is the other's quantized-
    // cosine top-1 (the LASER/CCMatrix mutuality precision filter) -----
    "s_mutual_nn" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Quantize.mutualTopPairs(
        emb.filter(col("vec_id") % 2 === 0),
        "vec_id",
        "embedding",
        emb.filter(col("vec_id") % 2 === 1),
        "vec_id",
        "embedding")
    },

    // ----- MIPS top-k (NEW r10): maximum-inner-product ranking \u2014 the
    // recommender semantics where magnitude matters and cosine's length
    // normalization is exactly wrong; de-quantized score = qdot\u00B7s_q\u00B7s_c
    // in a fixed association order, bit-reproducible -----
    "s_mips_topk" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Quantize.mipsTopK(
        emb,
        "vec_id",
        "embedding",
        emb.filter(col("vec_id") < 100),
        "vec_id",
        "embedding",
        k = 5)
    })

  /** The derived url column for the P39 gates: scheme/host-case/port/
    * tracking-param/fragment diversity keyed on doc_id so every
    * canonicalization rule fires on some slice of the corpus.
    */
  /** The refreshed-snapshot fixture shared by `p_snapshot_diff` and
    * `p_refresh_e2e`: every 7th doc dropped, every 5th's content bumped,
    * a shifted copy of every 13th added.
    */
  private def refreshedSnapshot(docs: DataFrame): DataFrame =
    docs
      .filter(col("doc_id") % 7 =!= 0)
      .withColumn(
        "text",
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
      .union(docs.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))

  private def withUrl(docs: DataFrame): DataFrame = {
    val d = col("doc_id")
    docs.select(
      col("doc_id"),
      concat(
        when(d % 5 === 0, lit("HTTP://")).otherwise(lit("HTTPS://")),
        lit("WWW."),
        upper(col("source")),
        lit("X."),
        when(d % 4 === 0, lit("co.uk"))
          .when(d % 4 === 1, lit("com"))
          .when(d % 4 === 2, lit("org"))
          .otherwise(lit("io")),
        when(d % 3 === 0, lit(":443"))
          .when(d % 3 === 1, lit(":8080"))
          .otherwise(lit("")),
        lit("/docs/"),
        col("lang"),
        lit("/"),
        d.cast(StringType),
        when(d % 6 === 5, lit(""))
          .when(
            d % 2 === 0,
            concat(
              lit("?utm_source=feed&id="),
              (d % 7).cast(StringType),
              lit("&b=2&a=1")))
          .otherwise(
            concat(lit("?id="), (d % 7).cast(StringType), lit("&ref=x"))),
        when(d % 2 === 1, concat(lit("#sec"), (d % 3).cast(StringType)))
          .otherwise(lit(""))).as("url"))
  }

  /** Url fixture with deliberate cross-doc collisions AFTER
    * canonicalization (doc_id appears only in tracking params / fragments,
    * which canonicalization strips) \u2014 the `u_url_dedup` fixture; mirrors
    * [[DupUrlSql]].
    */
  private def withDupUrl(docs: DataFrame): DataFrame = {
    val d = col("doc_id")
    docs.select(
      col("doc_id"),
      concat(
        lit("https://WWW."),
        upper(col("source")),
        lit("X.com/"),
        col("lang"),
        lit("?id="),
        (d % 3).cast(StringType),
        when(d % 2 === 0, lit("&utm_s=1")).otherwise(lit("")),
        when(d % 2 === 1, lit("#f")).otherwise(lit(""))).as("url"))
  }

  /** The full dedup pipeline: minhash pairs \u2192 transitive closure \u2192 drop
    * non-representatives; survivors = docs that are their own cluster
    * label (or unclustered). Shared verbatim by `p_dedup_survivors` and
    * `p_dedup_survivors_fast` (the latter must be result-identical).
    */
  private lazy val dedupSurvivorsOracle: String =
    s"""WITH RECURSIVE $minhashPairCtes,
       |pairs AS (
       |  SELECT id_a, id_b FROM verified WHERE i * 1.0 / u >= 0.5),
       |edges AS (
       |  SELECT id_a AS n, id_b AS m FROM pairs
       |  UNION ALL
       |  SELECT id_b AS n, id_a AS m FROM pairs),
       |reach(n, m) AS (
       |  SELECT n, m FROM edges
       |  UNION
       |  SELECT e.n, r.m FROM edges e JOIN reach r ON e.m = r.n),
       |lbl AS (SELECT n, least(n, min(m)) AS c FROM reach GROUP BY n)
       |SELECT d.doc_id, d.lang, d.source FROM documents d
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM lbl WHERE lbl.n = d.doc_id AND lbl.n <> lbl.c)"""
      .stripMargin

  /** DuckDB: the shared 10-word-window segmentation prefix (CTEs `d`, `c`,
    * `x`, `s`) \u2014 one owner for every corpus-level segment oracle so a fix
    * to the window construction cannot leave two oracles disagreeing.
    */
  private val SegmentWindowCtes: String =
    s"""d AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, CAST(ceil(len(w) / 10.0) AS BIGINT) AS nc, w FROM d),
       |x AS (SELECT doc_id, w, unnest(range(0, nc)) AS i FROM c),
       |s AS (
       |  SELECT doc_id, CAST(i AS INT) AS pos,
       |    array_to_string(list_slice(w, i*10 + 1, i*10 + 10), ' ') AS seg
       |  FROM x)""".stripMargin

  private lazy val segmentDedupOracle: String =
    s"""WITH $SegmentWindowCtes,
       |r AS (
       |  SELECT doc_id, pos, seg,
       |    row_number() OVER (
       |      PARTITION BY ${hash61Sql("seg")} ORDER BY doc_id, pos) AS rn
       |  FROM s),
       |k AS (
       |  SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS clean_text,
       |    count(*) AS n_kept
       |  FROM r WHERE rn = 1 GROUP BY doc_id)
       |SELECT c.doc_id, coalesce(k.clean_text, '') AS clean_text,
       |  coalesce(k.n_kept, 0) AS n_kept,
       |  c.nc - coalesce(k.n_kept, 0) AS n_dropped
       |FROM c LEFT JOIN k ON c.doc_id = k.doc_id""".stripMargin

  /** DuckDB: the derived url column \u2014 mirrors [[withUrl]] bit-for-bit. */
  private val UrlSql =
    """CASE WHEN doc_id % 5 = 0 THEN 'HTTP://' ELSE 'HTTPS://' END ||
      |    'WWW.' || upper(source) || 'X.' ||
      |    CASE doc_id % 4 WHEN 0 THEN 'co.uk' WHEN 1 THEN 'com'
      |      WHEN 2 THEN 'org' ELSE 'io' END ||
      |    CASE doc_id % 3 WHEN 0 THEN ':443' WHEN 1 THEN ':8080'
      |      ELSE '' END ||
      |    '/docs/' || lang || '/' || CAST(doc_id AS VARCHAR) ||
      |    CASE WHEN doc_id % 6 = 5 THEN ''
      |      WHEN doc_id % 2 = 0 THEN '?utm_source=feed&id=' ||
      |        CAST(doc_id % 7 AS VARCHAR) || '&b=2&a=1'
      |      ELSE '?id=' || CAST(doc_id % 7 AS VARCHAR) || '&ref=x' END ||
      |    CASE WHEN doc_id % 2 = 1 THEN '#sec' || CAST(doc_id % 3 AS VARCHAR)
      |      ELSE '' END""".stripMargin

  /** DuckDB: url with deliberate CROSS-DOC collisions after
    * canonicalization (no doc_id in the canonical part; tracking params /
    * fragments differ per row and are canonicalized away) \u2014 the
    * `u_url_dedup` fixture. Mirrors [[withDupUrl]] bit-for-bit.
    */
  private val DupUrlSql =
    """'https://WWW.' || upper(source) || 'X.com/' || lang ||
      |    '?id=' || CAST(doc_id % 3 AS VARCHAR) ||
      |    CASE WHEN doc_id % 2 = 0 THEN '&utm_s=1' ELSE '' END ||
      |    CASE WHEN doc_id % 2 = 1 THEN '#f' ELSE '' END""".stripMargin

  /** DuckDB CTE chain `u` \u2192 `p` \u2192 `dm` over the given url expression:
    * url, parsed fields, registered domain (same regexes and suffix
    * heuristic as [[graft.ops.Urls]]).
    */
  // URL parse + PSL-lite registered-domain CTEs over an existing CTE
  // `u(doc_id, url)` \u2014 factored out so multi-url-per-doc relations
  // (outlink extraction) replay the exact same domain logic
  private def urlDomainCtes(urlSql: String): String =
    s"""u AS (SELECT doc_id, $urlSql AS url FROM documents),
       |$UrlParseCtes""".stripMargin

  private val UrlParseCtes: String =
    s"""p AS (
       |  SELECT u.*,
       |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
       |      AS scheme,
       |    lower(regexp_extract(url,
       |      '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1))
       |      AS host,
       |    regexp_extract(regexp_extract(url,
       |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
       |      ':([0-9]+)${"$"}', 1) AS port,
       |    regexp_extract(url,
       |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
       |    regexp_extract(url, '^[^#]*\\?([^#]*)', 1) AS qs
       |  FROM u),
       |dm AS (
       |  SELECT p.*,
       |    CASE WHEN len(labels) <= 2 THEN host
       |      WHEN length(labels[len(labels)]) = 2
       |        AND labels[len(labels)-1] IN
       |          ('co','com','net','org','gov','ac','edu')
       |        THEN array_to_string(
       |          list_slice(labels, len(labels)-2, len(labels)), '.')
       |      ELSE array_to_string(
       |          list_slice(labels, len(labels)-1, len(labels)), '.')
       |    END AS domain
       |  FROM (SELECT p.*, string_split(host, '.') AS labels FROM p) p)"""
      .stripMargin

  /** DuckDB CTE `f` (over `dm`): the filtered+sorted surviving query
    * string `sq` (tracking params dropped, byte-sorted; [] \u2192 '').
    */
  private val CanonQueryCte =
    """f AS (
      |  -- array_to_string([]) is NULL in DuckDB vs '' for Spark array_join
      |  SELECT dm.*,
      |    coalesce(
      |      array_to_string(list_sort(list_filter(string_split(qs, '&'),
      |        x -> x <> ''
      |          AND NOT starts_with(
      |            regexp_extract(x, '^([^=]*)', 1), 'utm_')
      |          AND NOT (regexp_extract(x, '^([^=]*)', 1) IN
      |            ('fbclid','gclid','msclkid','ref')))), '&'), '') AS sq
      |  FROM dm)""".stripMargin

  /** DuckDB: the canonical url expression over `f`'s columns. */
  private val CanonUrlSql =
    """scheme || '://' || host ||
      |  CASE WHEN port = '' OR (scheme = 'https' AND port = '443')
      |         OR (scheme = 'http' AND port = '80')
      |    THEN '' ELSE ':' || port END ||
      |  path ||
      |  CASE WHEN sq = '' THEN '' ELSE '?' || sq END""".stripMargin

  /** DuckDB: the Morton interleave as the same shift/mask sum
    * [[graft.ops.ZOrder.zValue]] computes \u2014 generated from the identical
    * (bit position, weight) constants so the two sides cannot drift.
    */
  private def zorderSql(cols: Seq[String], bits: Int): String =
    (for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield s"(((CAST($c AS BIGINT) >> $i) & 1) * " +
      s"${1L << (i * cols.size + j)})").mkString(" + ")

  /** DuckDB CTE chain `q8`: per-vector int8 scale + codes (mirrors
    * [[graft.ops.Quantize]]: round-half-up `floor(x/s + 0.5)`).
    */
  // Shared P73 gate parameters (Spark query and generated oracle read the
  // same constants so they cannot drift).
  /** DuckDB replay of [[graft.ops.PageRank.ranks]] over an arbitrary edge
    * CTE body (`SELECT \u2026 src, \u2026 dst`) \u2014 generated from the SAME constants
    * as the Scala side so the two cannot drift; `//` = exact floor
    * division on positive longs. Shared by `u_pagerank` (doc graph) and
    * `u_host_rank` (registered-domain multigraph).
    */
  private def pagerankSql(
      edgesSelect: String,
      iters: Int,
      scale: Long = 1000000000000L,
      dn: Int = 85,
      dd: Int = 100,
      redistributeDangling: Boolean = false,
      preCtes: String = ""): String = {
    val iterCtes = (1 to iters).map { i =>
      // with redistribution, each iteration folds the PREVIOUS ranks'
      // dangling mass (out-degree-0 nodes) back uniformly \u2014 same exact
      // floor-division share as PageRank.ranks
      val dangCte =
        if (!redistributeDangling) ""
        else
          s"""d$i AS (
             |  SELECT CAST(coalesce(sum(rank), 0) AS BIGINT) AS dm
             |  FROM r${i - 1}
             |  WHERE node NOT IN (SELECT src FROM deg)),
             |""".stripMargin
      val dangAdd =
        if (!redistributeDangling) ""
        else s" +\n      (SELECT (dm * $dn) // ($dd * nv) FROM d$i, nn)"
      s"""${dangCte}c$i AS (
         |  SELECT e.dst AS node,
         |    sum((r.rank * $dn) // ($dd * deg.d)) AS inr
         |  FROM e JOIN r${i - 1} r ON e.src = r.node
         |  JOIN deg ON e.src = deg.src
         |  GROUP BY e.dst),
         |r$i AS (
         |  SELECT nodes.node,
         |    CAST(($scale * ${dd - dn}) // ($dd * (SELECT nv FROM nn)) +
         |      coalesce(c$i.inr, 0)$dangAdd AS BIGINT) AS rank
         |  FROM nodes LEFT JOIN c$i ON nodes.node = c$i.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${preCtes}e AS (
       |  $edgesSelect),
       |nodes AS (SELECT DISTINCT node FROM (
       |  SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS nv FROM nodes),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY src),
       |r0 AS (
       |  SELECT node, $scale // (SELECT nv FROM nn) AS rank FROM nodes),
       |$iterCtes
       |SELECT node, rank FROM r$iters""".stripMargin
  }

  /** DuckDB replay of [[graft.ops.PageRank.personalizedRanks]] (TrustRank):
    * the [[pagerankSql]] chain with the teleport term and initial mass
    * restricted to the seed predicate \u2014 exact integer arithmetic, no
    * dangling redistribution (the simplified variant).
    */
  private def trustrankSql(
      edgesSelect: String,
      seedPred: String,
      iters: Int,
      scale: Long = 1000000000000L,
      dn: Int = 85,
      dd: Int = 100): String = {
    val iterCtes = (1 to iters).map { i =>
      s"""c$i AS (
         |  SELECT e.dst AS node,
         |    sum((r.rank * $dn) // ($dd * deg.d)) AS inr
         |  FROM e JOIN r${i - 1} r ON e.src = r.node
         |  JOIN deg ON e.src = deg.src
         |  GROUP BY e.dst),
         |r$i AS (
         |  SELECT nodes.node,
         |    CAST(CASE WHEN nodes.is_seed = 1
         |      THEN ($scale * ${dd - dn}) // ($dd * (SELECT ns FROM sn))
         |      ELSE 0 END + coalesce(c$i.inr, 0) AS BIGINT) AS rank
         |  FROM nodes LEFT JOIN c$i ON nodes.node = c$i.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  $edgesSelect),
       |nodes AS (
       |  SELECT node, CASE WHEN $seedPred THEN 1 ELSE 0 END AS is_seed
       |  FROM (SELECT DISTINCT node FROM (
       |    SELECT src AS node FROM e UNION ALL SELECT dst FROM e))),
       |sn AS (SELECT CAST(sum(is_seed) AS BIGINT) AS ns FROM nodes),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY src),
       |r0 AS (
       |  SELECT node, CASE WHEN is_seed = 1
       |    THEN $scale // (SELECT ns FROM sn) ELSE 0 END AS rank
       |  FROM nodes),
       |$iterCtes
       |SELECT node, rank FROM r$iters""".stripMargin
  }

  /** DuckDB replay of [[graft.ops.Hits.ranks]]: per iteration one
    * authority half-step (sum hub scores over in-edges, floor-div rescale
    * by `max(1, \u230Amax/scale\u230B)`) and one hub half-step (sum authority
    * scores over out-edges, same rescale) \u2014 exact integer arithmetic, so
    * the unrolled CTE chain reproduces the Spark scores bit-for-bit.
    */
  private def hitsSql(
      edgesSelect: String,
      iters: Int,
      scale: Long = 1000000L): String = {
    // each CTE is referenced exactly ONCE downstream (the rescale divisor
    // is a window max, not a second aggregate read): DuckDB inlines
    // non-materialized CTEs, so a double reference per iteration would
    // expand the plan exponentially in `iters`
    val iterCtes = (1 to iters).map { i =>
      s"""ax$i AS (
         |  SELECT node, raw // greatest(1, max(raw) OVER () // $scale) AS v
         |  FROM (SELECT e.dst AS node, sum(h.h) AS raw
         |        FROM e JOIN h${i - 1} h ON e.src = h.node GROUP BY e.dst)),
         |a$i AS (
         |  SELECT nodes.node, CAST(coalesce(ax.v, 0) AS BIGINT) AS a
         |  FROM nodes LEFT JOIN ax$i ax ON nodes.node = ax.node),
         |hx$i AS (
         |  SELECT node, raw // greatest(1, max(raw) OVER () // $scale) AS v
         |  FROM (SELECT e.src AS node, sum(a.a) AS raw
         |        FROM e JOIN a$i a ON e.dst = a.node GROUP BY e.src)),
         |h$i AS (
         |  SELECT nodes.node, CAST(coalesce(hx.v, 0) AS BIGINT) AS h
         |  FROM nodes LEFT JOIN hx$i hx ON nodes.node = hx.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  $edgesSelect),
       |nodes AS (SELECT DISTINCT node FROM (
       |  SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
       |h0 AS (SELECT node, CAST($scale AS BIGINT) AS h FROM nodes),
       |$iterCtes
       |SELECT h.node, h.h AS hub, a.a AS authority
       |FROM h$iters h JOIN a$iters a ON h.node = a.node""".stripMargin
  }

  /** s_pca_ann in-gate floor for the 8-of-64-dim captured-variance share.
    * Measured 0.2035/0.2049/0.1598 at sf0.001/0.01/0.1 (near-isotropic
    * synthetic embeddings: the fitted basis beats the 8/64 = 0.125
    * random-subspace baseline by the sample-covariance eigenvalue spread);
    * floor sits between the baseline and the weakest measurement.
    */
  private val PcaVarianceShareFloor = 0.14

  private val IvfIntCells = 8
  private val IvfIntIters = 2
  private val IvfIntNprobe = 2
  private val IvfIntK = 5
  private val IvfIntNQueries = 50

  /** DuckDB: exact integer dot of two BIGINT-list columns, as DOUBLE (the
    * Spark side computes the long [[graft.ops.Quantize.intDot]] and casts \u2014
    * integer products are exact in both, the cast is one rounding).
    */
  private def intDotSql(x: String, y: String): String =
    s"CAST(list_reduce(list_transform(range(1, len($x) + 1), " +
      s"i -> $x[i] * $y[i]), (acc, v) -> acc + v) AS DOUBLE)"

  /** DuckDB replay of [[graft.ops.IvfInt]] training: codes + norms (`n`),
    * exploded codes (`x`), dimension index (`idx`), hash-seeded centroids
    * (`c0`), then `iters` UNROLLED k-means rounds (assignment = cosine
    * argmax with lowest-cell ties; update = floor(\u03A3q/n) per dim with
    * empty-cell carry) ending at the trained long table `c$iters`.
    * Expects the `q8` quantization CTE in scope.
    */
  private def ivfIntTrainCtes(cells: Int, iters: Int): String = {
    val seed =
      s"""n AS (
         |  SELECT vec_id, q,
         |    CAST(list_sum(list_transform(q, v -> v * v)) AS BIGINT) AS n2
         |  FROM q8),
         |idx AS (
         |  SELECT unnest(range(1, (SELECT max(len(q)) FROM n) + 1)) AS i),
         |x AS (SELECT vec_id, i, q[i] AS v FROM n CROSS JOIN idx),
         |sd AS (
         |  SELECT q, row_number() OVER (ORDER BY h, id) - 1 AS cid FROM (
         |    SELECT q, CAST(vec_id AS VARCHAR) AS id,
         |      ${hash61Sql("CAST(vec_id AS VARCHAR)")} AS h
         |    FROM n ORDER BY h, id LIMIT $cells)),
         |c0 AS (SELECT cid, i, q[i] AS val FROM sd CROSS JOIN idx)""".stripMargin
    val rounds = (0 until iters).map { t =>
      s"""m$t AS (
         |  SELECT cid, cv,
         |    CAST(list_sum(list_transform(cv, v -> v * v)) AS BIGINT) AS n2c
         |  FROM (SELECT cid, list(val ORDER BY i) AS cv FROM c$t GROUP BY cid)),
         |a$t AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT n.vec_id, m.cid, row_number() OVER (PARTITION BY n.vec_id
         |      ORDER BY CASE WHEN m.n2c = 0 THEN 0.0
         |        ELSE ${intDotSql("n.q", "m.cv")} / sqrt(CAST(m.n2c AS DOUBLE))
         |        END DESC, m.cid ASC) AS rn
         |    FROM n CROSS JOIN m$t m) WHERE rn = 1),
         |s$t AS (
         |  SELECT a.cid, x.i,
         |    CAST(FLOOR(CAST(sum(x.v) AS DOUBLE) / count(*)) AS BIGINT) AS val
         |  FROM a$t a JOIN x ON x.vec_id = a.vec_id GROUP BY a.cid, x.i),
         |c${t + 1} AS (
         |  SELECT * FROM s$t UNION ALL
         |  SELECT c.cid, c.i, c.val FROM c$t c
         |  WHERE c.cid NOT IN (SELECT cid FROM s$t))""".stripMargin
    }
    (seed +: rounds).mkString(",\n")
  }

  // Shared t_scripts fixture runs (\uXXXX escapes only; the oracle derives
  // its chr() codes from these same constants so they cannot drift)
  private val ScriptFixtureCjk = "\u4F60\u597D\u4E16\u754C"
  private val ScriptFixtureCyr = "\u043F\u0440\u0438\u0432\u0435\u0442"
  private val ScriptFixtureArab = "\u0645\u0631\u062D\u0628\u0627"
  private def chrsOf(s: String): String =
    s.map(c => s"chr(${c.toInt})").mkString(" || ")

  // Shared P75 mixture-plan gate parameters (upsampling permitted: zh is
  // under-represented against its 300\u2030 target at this budget).
  private val MixPlanTargets: scala.collection.immutable.ListMap[String, Int] =
    scala.collection.immutable.ListMap("en" -> 400, "zh" -> 300)
  private val MixPlanDefault = 100
  private val MixPlanBudget = 500000L
  private val MixPlanMax = 2000

  // Shared P74 gate parameters.
  private val PqM = 2
  private val PqCells = 4
  private val PqIters = 1
  private val PqK = 5
  private val PqNQueries = 25

  /** DuckDB: exact integer dot of two BIGINT-list columns (stays BIGINT \u2014
    * the PQ replay never touches floating point).
    */
  private def intDotLongSql(x: String, y: String): String =
    s"CAST(list_reduce(list_transform(range(1, len($x) + 1), " +
      s"i -> $x[i] * $y[i]), (acc, v) -> acc + v) AS BIGINT)"

  /** DuckDB replay of [[graft.ops.Pq]] training: per-subspace slices
    * (`ns$s`/`x$s`), shared hash-seeded rows (`psd`), and `iters`
    * UNROLLED integer k-means rounds per subspace (assignment = exact-long
    * `2\u00B7dot \u2212 \u2016c\u2016\u00B2` argmax with lowest-cell ties; update = floor(\u03A3q/n);
    * empty-cell carry) ending at `b${s}_$iters` long tables plus their
    * list forms `pm${s}_$iters`. Expects `q8` in scope.
    */
  private def pqTrainCtes(m: Int, cells: Int, iters: Int): String = {
    val base =
      s"""pn AS (SELECT vec_id, q FROM q8),
         |psub AS (SELECT CAST(max(len(q)) // $m AS BIGINT) AS sb FROM pn),
         |pidx AS (
         |  SELECT unnest(range(1, (SELECT sb FROM psub) + 1)) AS i),
         |psd AS (
         |  SELECT q, row_number() OVER (ORDER BY h, id) - 1 AS cid FROM (
         |    SELECT q, CAST(vec_id AS VARCHAR) AS id,
         |      ${hash61Sql("CAST(vec_id AS VARCHAR)")} AS h
         |    FROM pn ORDER BY h, id LIMIT $cells))""".stripMargin
    val perSub = (0 until m).map { s =>
      val lo = s"$s * (SELECT sb FROM psub) + 1"
      val hi = s"(${s + 1}) * (SELECT sb FROM psub)"
      s"""ns$s AS (
         |  SELECT vec_id, list_slice(q, $lo, $hi) AS qs FROM pn),
         |x$s AS (SELECT vec_id, i, qs[i] AS v FROM ns$s CROSS JOIN pidx),
         |b${s}_0 AS (
         |  SELECT cid, i, qs[i] AS val FROM
         |    (SELECT cid, list_slice(q, $lo, $hi) AS qs FROM psd)
         |    CROSS JOIN pidx)""".stripMargin
    }
    val rounds = for (t <- 0 until iters; s <- 0 until m) yield {
      s"""pm${s}_$t AS (
         |  SELECT cid, cv,
         |    CAST(list_sum(list_transform(cv, v -> v * v)) AS BIGINT) AS n2c
         |  FROM (SELECT cid, list(val ORDER BY i) AS cv FROM b${s}_$t
         |        GROUP BY cid)),
         |pa${s}_$t AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT ns.vec_id, m.cid,
         |      row_number() OVER (PARTITION BY ns.vec_id
         |        ORDER BY 2 * ${intDotLongSql("ns.qs", "m.cv")} - m.n2c DESC,
         |          m.cid ASC) AS rn
         |    FROM ns$s ns CROSS JOIN pm${s}_$t m) WHERE rn = 1),
         |ps${s}_$t AS (
         |  SELECT a.cid, x.i,
         |    CAST(FLOOR(CAST(sum(x.v) AS DOUBLE) / count(*)) AS BIGINT) AS val
         |  FROM pa${s}_$t a JOIN x$s x ON x.vec_id = a.vec_id
         |  GROUP BY a.cid, x.i),
         |b${s}_${t + 1} AS (
         |  SELECT * FROM ps${s}_$t UNION ALL
         |  SELECT b.cid, b.i, b.val FROM b${s}_$t b
         |  WHERE b.cid NOT IN (SELECT cid FROM ps${s}_$t))""".stripMargin
    }
    val finalBooks = (0 until m).map { s =>
      s"""pm${s}_$iters AS (
         |  SELECT cid, cv,
         |    CAST(list_sum(list_transform(cv, v -> v * v)) AS BIGINT) AS n2c
         |  FROM (SELECT cid, list(val ORDER BY i) AS cv FROM b${s}_$iters
         |        GROUP BY cid))""".stripMargin
    }
    ((base +: perSub) ++ rounds ++ finalBooks).mkString(",\n")
  }

  private val QuantizeCtes =
    """q8 AS (
      |  SELECT vec_id, s,
      |    list_transform(embedding,
      |      x -> CAST(FLOOR(CAST(x AS DOUBLE) / s + 0.5) AS BIGINT)) AS q
      |  FROM (
      |    SELECT vec_id, embedding,
      |      CASE WHEN m = 0 THEN CAST(1.0 AS DOUBLE) ELSE m / 127 END AS s
      |    FROM (
      |      SELECT vec_id, embedding,
      |        list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
      |          AS m
      |      FROM embeddings)))""".stripMargin

  /** Quantized brute-force top-k replay (the s_quant_topk oracle),
    * parameterized so the s_ann_recall composition can reuse it as its
    * ground-truth CTE with the IVF gate's query set.
    */
  private def quantTopkSql(nQueries: Int, k: Int): String =
    s"""WITH $QuantizeCtes,
       |n AS (
       |  SELECT vec_id, q,
       |    CAST(list_reduce(
       |      list_transform(range(1, len(q)+1), i -> q[i]*q[i]),
       |      (acc, v) -> acc + v) AS BIGINT) AS nrm
       |  FROM q8),
       |pr AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    CAST(list_reduce(
       |      list_transform(range(1, len(a.q)+1), i -> a.q[i]*b.q[i]),
       |      (acc, v) -> acc + v) AS BIGINT) AS qdot,
       |    a.nrm AS na, b.nrm AS nb
       |  FROM n a, n b WHERE a.vec_id < $nQueries AND a.vec_id <> b.vec_id),
       |sc AS (
       |  SELECT query_id, neighbor_id, qdot,
       |    CASE WHEN na = 0 OR nb = 0 THEN CAST(0.0 AS DOUBLE)
       |      ELSE CAST(qdot AS DOUBLE) /
       |        (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) END
       |      AS qcos
       |  FROM pr)
       |SELECT query_id, neighbor_id, rank, qdot, qcos FROM (
       |  SELECT sc.*, row_number() OVER (PARTITION BY query_id
       |    ORDER BY qcos DESC, neighbor_id) AS rank
       |  FROM sc) WHERE rank <= $k""".stripMargin

  /** Integer-exact IVF search replay (the s_ivf_int_topk oracle): train
    * (unrolled rounds), assign with the final centroids, probe, rank.
    * Shared by the s_ivf_int_topk gate and the s_ann_recall composition.
    */
  private def ivfIntTopkSql: String =
    s"""WITH $QuantizeCtes,
       |${ivfIntTrainCtes(IvfIntCells, IvfIntIters)},
       |mf AS (
       |  SELECT cid, cv,
       |    CAST(list_sum(list_transform(cv, v -> v * v)) AS BIGINT) AS n2c
       |  FROM (SELECT cid, list(val ORDER BY i) AS cv
       |        FROM c$IvfIntIters GROUP BY cid)),
       |af AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT n.vec_id, m.cid, row_number() OVER (PARTITION BY n.vec_id
       |      ORDER BY CASE WHEN m.n2c = 0 THEN 0.0
       |        ELSE ${intDotSql("n.q", "m.cv")} / sqrt(CAST(m.n2c AS DOUBLE))
       |        END DESC, m.cid ASC) AS rn
       |    FROM n CROSS JOIN mf m) WHERE rn = 1),
       |qp AS (
       |  SELECT query_id, qq, qn2, cid FROM (
       |    SELECT n.vec_id AS query_id, n.q AS qq, n.n2 AS qn2, m.cid,
       |      row_number() OVER (PARTITION BY n.vec_id
       |        ORDER BY CASE WHEN m.n2c = 0 THEN 0.0
       |          ELSE ${intDotSql("n.q", "m.cv")} / sqrt(CAST(m.n2c AS DOUBLE))
       |          END DESC, m.cid ASC) AS rn
       |    FROM n CROSS JOIN mf m WHERE n.vec_id < $IvfIntNQueries)
       |  WHERE rn <= $IvfIntNprobe),
       |cand AS (
       |  SELECT query_id, neighbor_id,
       |    CASE WHEN qn2 = 0 OR cn2 = 0 THEN CAST(0.0 AS DOUBLE)
       |      ELSE ${intDotSql("qq", "cq")} /
       |        (sqrt(CAST(qn2 AS DOUBLE)) * sqrt(CAST(cn2 AS DOUBLE))) END
       |      AS qcos
       |  FROM (
       |    SELECT p.query_id, cn.vec_id AS neighbor_id, p.qq, p.qn2,
       |      cn.q AS cq, cn.n2 AS cn2
       |    FROM qp p JOIN af a ON a.cid = p.cid
       |    JOIN n cn ON cn.vec_id = a.vec_id
       |    WHERE cn.vec_id <> p.query_id))
       |SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rank, qcos
       |FROM (
       |  SELECT cand.*, row_number() OVER (PARTITION BY query_id
       |    ORDER BY qcos DESC, neighbor_id ASC) AS rnk
       |  FROM cand) WHERE rnk <= $IvfIntK""".stripMargin

  val oracles: Map[String, String] = Map(
    "p_exact_dedup" ->
      """SELECT md5(text) AS fp, min(doc_id) AS doc_id_kept, count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "p_ngram_jaccard" -> {
      s"""WITH d AS (
         |  SELECT doc_id, lang, source, ${hashedShinglesSql(WsSql)} AS sh
         |  FROM documents WHERE len($WsSql) >= 3),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    len(list_intersect(a.sh, b.sh)) AS i,
         |    len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS u
         |  FROM d a JOIN d b
         |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b, i * 1.0 / u AS jaccard
         |FROM pairs WHERE i * 1.0 / u >= 0.5""".stripMargin
    },
    "p_minhash_lsh" -> {
      s"""WITH $minhashPairCtes
         |SELECT id_a, id_b, i * 1.0 / u AS jaccard
         |FROM verified WHERE i * 1.0 / u >= 0.5""".stripMargin
    },
    // char-shingle replay over the space-stripped fixture \u2014 the SAME
    // generated banded-minhash machinery as p_minhash_lsh
    "p_char_minhash" -> {
      val txt = "regexp_replace(text, '\\s+', '', 'g')"
      val shExpr =
        s"list_distinct(list_transform(" +
          s"list_transform(range(1, greatest(length($txt) - 4, 0) + 1), " +
          s"i -> substr($txt, i, 5)), s -> ${hash61Sql("s")}))"
      s"""WITH ${minhashPairCtesFor(shExpr)}
         |SELECT id_a, id_b, i * 1.0 / u AS jaccard
         |FROM verified WHERE i * 1.0 / u >= 0.6""".stripMargin
    },
    // estimator audit: the shared banded-minhash replay's sig/cand CTEs,
    // agreement counted over the 16 permutation slots
    "p_minhash_estimate" -> {
      s"""WITH $minhashPairCtes,
         |est AS (
         |  SELECT c.id_a, c.id_b,
         |    CAST(len(list_filter(list_transform(range(1, 17),
         |      j -> sa.sig[j] = sb.sig[j]), x -> x)) AS BIGINT) AS sig_agree,
         |    CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS i,
         |    CAST(len(sa.sh) + len(sb.sh) -
         |      len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS u
         |  FROM cand c
         |  JOIN sig sa ON sa.doc_id = c.id_a
         |  JOIN sig sb ON sb.doc_id = c.id_b)
         |SELECT id_a, id_b, sig_agree,
         |  CAST((sig_agree * 1000000) // 16 AS BIGINT) AS est_ppm,
         |  CAST((i * 1000000) // u AS BIGINT) AS exact_ppm
         |FROM est""".stripMargin
    },
    // LSH recall audit: found = the banded-minhash replay at the coarse
    // 2x8 config; truth = the p_prefix_jaccard all-pairs exact replay;
    // integer count/ppm arithmetic
    "p_lsh_recall" -> {
      s"""WITH ${minhashPairCtesFor(hashedShinglesSql(WsSql), bands = 2, rows = 8)},
         |found AS (
         |  SELECT id_a, id_b FROM verified WHERE i * 1.0 / u >= 0.5),
         |de AS (
         |  SELECT doc_id, ${hashedShinglesSql(WsSql)} AS sh
         |  FROM documents WHERE len($WsSql) >= 3),
         |tp AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM de a JOIN de b ON a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
         |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
         |c AS (
         |  SELECT
         |    (SELECT count(*) FROM tp) AS n_true,
         |    (SELECT count(*) FROM found) AS n_found,
         |    (SELECT count(*) FROM tp JOIN found USING (id_a, id_b)) AS n_hit)
         |SELECT n_true, n_found, n_hit, n_true - n_hit AS n_missed,
         |  CASE WHEN n_true = 0 THEN 1000000
         |       ELSE (n_hit * 1000000) // n_true END AS recall_ppm
         |FROM c""".stripMargin
    },
    // NAIVE all-pairs levenshtein \u2014 the losslessness proof for the FastSS
    // deletion-neighborhood candidates in Dedup.editDistancePairs
    "p_edit_pairs" -> {
      """WITH titled AS (
        |  SELECT doc_id,
        |    substr(text, 1, 12) ||
        |      CASE WHEN doc_id % 7 = 0 THEN 'x' ELSE '' END AS title
        |  FROM documents),
        |reps AS (SELECT title, min(doc_id) AS doc_id FROM titled GROUP BY title)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.title, b.title) AS INTEGER) AS dist
        |FROM reps a JOIN reps b ON a.doc_id < b.doc_id
        |WHERE levenshtein(a.title, b.title) <= 1""".stripMargin
    },
    // the oracle is the NAIVE all-pairs join the prefix filter replaces \u2014
    // hash-matching it is the losslessness proof (no blocking, no bands)
    "p_prefix_jaccard" -> {
      s"""WITH d AS (
         |  SELECT doc_id, ${hashedShinglesSql(WsSql)} AS sh
         |  FROM documents WHERE len($WsSql) >= 3),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    len(list_intersect(a.sh, b.sh)) AS i,
         |    len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS u
         |  FROM d a JOIN d b ON a.doc_id < b.doc_id)
         |SELECT id_a, id_b, i * 1.0 / u AS jaccard
         |FROM pairs WHERE i * 1.0 / u >= 0.5""".stripMargin
    },
    // NAIVE all-pairs directional containment \u2014 the lossless-candidate
    // proof for Dedup.containmentPairs (same role the all-pairs jaccard
    // oracle plays for p_prefix_jaccard). inter >= ceil(len_a * t) is
    // compared cross-multiplied so no float division enters the predicate.
    "p_containment" -> {
      s"""WITH d AS (
         |  SELECT doc_id, ${hashedShinglesSql(WsSql)} AS sh
         |  FROM documents WHERE len($WsSql) >= 3),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
         |    CAST(len(a.sh) AS BIGINT) AS len_a
         |  FROM d a JOIN d b ON a.doc_id <> b.doc_id)
         |SELECT id_a, id_b, inter, len_a,
         |  CAST((inter * 1000000) // len_a AS BIGINT) AS containment_ppm
         |FROM pairs WHERE inter * 1000000 >= 500000 * len_a""".stripMargin
    },
    // priority dedup: replayed as a per-fp window (the oracle need not be
    // partial-agg'able \u2014 only the Spark side carries the scale constraint)
    "p_dedup_keep_best" -> {
      s"""WITH p AS (
         |  SELECT doc_id, md5(text) AS fp,
         |    ${hash61Sql("'prio:' || CAST(doc_id AS VARCHAR)")} % 1000 AS sc
         |  FROM documents),
         |r AS (
         |  SELECT fp, doc_id, sc,
         |    row_number() OVER (PARTITION BY fp ORDER BY sc DESC, doc_id ASC)
         |      AS rn,
         |    count(*) OVER (PARTITION BY fp) AS n
         |  FROM p)
         |SELECT fp, doc_id AS doc_id_kept, CAST(sc AS BIGINT) AS score_kept,
         |  CAST(n AS BIGINT) AS n_copies
         |FROM r WHERE rn = 1""".stripMargin
    },
    "u_robots_filter" -> {
      s"""WITH u AS (
         |  SELECT doc_id,
         |    'https://www.d' || CAST(doc_id % 25 AS VARCHAR) || '.com' ||
         |      CASE WHEN doc_id % 4 = 0 THEN '/admin/p' ELSE '/p' END ||
         |      CAST(doc_id AS VARCHAR) AS url,
         |    'd' || CAST(doc_id % 25 AS VARCHAR) || '.com' AS dom,
         |    CASE WHEN doc_id % 4 = 0 THEN '/admin/p' ELSE '/p' END ||
         |      CAST(doc_id AS VARCHAR) AS path
         |  FROM documents),
         |r AS (
         |  SELECT 'd' || CAST(unnest(range(0, 10)) AS VARCHAR) || '.com'
         |    AS rule_domain, '/admin' AS rule_prefix)
         |SELECT doc_id, url FROM u
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM r
         |  WHERE u.dom = r.rule_domain
         |    AND starts_with(u.path, r.rule_prefix))""".stripMargin
    },
    // robots decisions: VALUES generated from the SAME RobotsRules
    // constant as the gate; group selection, longest-match, allow-on-tie
    // all replayed relationally
    "u_robots_decisions" -> {
      val values = RobotsRules
        .map { case (d, a, r, p) => s"('$d', '$a', '$r', '$p')" }
        .mkString(", ")
      s"""WITH u AS (
         |  SELECT doc_id,
         |    'https://www.d' || CAST(doc_id % 25 AS VARCHAR) || '.com' ||
         |      CASE WHEN doc_id % 8 = 0 THEN '/admin/tools/p'
         |           WHEN doc_id % 4 = 0 THEN '/admin/p'
         |           ELSE '/public/p' END ||
         |      CAST(doc_id AS VARCHAR) AS url,
         |    'd' || CAST(doc_id % 25 AS VARCHAR) || '.com' AS dom,
         |    CASE WHEN doc_id % 8 = 0 THEN '/admin/tools/p'
         |         WHEN doc_id % 4 = 0 THEN '/admin/p'
         |         ELSE '/public/p' END ||
         |      CAST(doc_id AS VARCHAR) AS path
         |  FROM documents),
         |rules(rule_domain, agent, rule, prefix) AS (VALUES $values),
         |specific AS (
         |  SELECT DISTINCT rule_domain FROM rules WHERE agent = 'graftbot'),
         |path_rules AS (
         |  SELECT rule_domain, agent, rule, prefix FROM rules
         |  WHERE rule IN ('allow', 'disallow')),
         |applicable AS (
         |  SELECT rule_domain, rule, prefix FROM path_rules
         |  WHERE agent = 'graftbot'
         |  UNION ALL
         |  SELECT rule_domain, rule, prefix FROM path_rules
         |  WHERE agent = '*' AND rule_domain NOT IN
         |    (SELECT rule_domain FROM specific)),
         |delays AS (
         |  SELECT rule_domain,
         |    CAST(max(CAST(prefix AS DECIMAL(10,3)) * 1000) AS BIGINT)
         |      AS crawl_delay_ms
         |  FROM (
         |    SELECT rule_domain, agent, prefix FROM rules
         |    WHERE rule = 'crawl-delay' AND
         |      regexp_matches(prefix, '^[0-9]{1,6}(\\.[0-9]{1,3})?$$')) dr
         |  WHERE agent = 'graftbot'
         |     OR (agent = '*' AND rule_domain NOT IN
         |       (SELECT rule_domain FROM specific))
         |  GROUP BY rule_domain),
         |m AS (
         |  SELECT u.doc_id, u.url, u.dom, a.rule, a.prefix,
         |    row_number() OVER (PARTITION BY u.doc_id
         |      ORDER BY length(a.prefix) DESC, a.rule ASC, a.prefix ASC)
         |      AS rn
         |  FROM u LEFT JOIN applicable a
         |    ON u.dom = a.rule_domain AND starts_with(u.path, a.prefix))
         |SELECT m.doc_id, m.url, m.dom AS domain,
         |  coalesce(m.rule, 'allow') AS decision,
         |  coalesce(m.prefix, '') AS matched_prefix,
         |  coalesce(d.crawl_delay_ms, 0) AS crawl_delay_ms
         |FROM m LEFT JOIN delays d ON m.dom = d.rule_domain
         |WHERE m.rn = 1""".stripMargin
    },
    "u_fetch_slots" -> {
      s"""WITH u AS (
         |  SELECT doc_id,
         |    'https://www.d' || CAST(doc_id % 25 AS VARCHAR) || '.com/p' ||
         |      CAST(doc_id AS VARCHAR) AS url,
         |    'd' || CAST(doc_id % 25 AS VARCHAR) || '.com' AS domain
         |  FROM documents)
         |SELECT doc_id, url, domain,
         |  CAST((row_number() OVER (PARTITION BY domain
         |    ORDER BY ${hash61Sql("'slot:' || CAST(doc_id AS VARCHAR)")},
         |      doc_id) - 1) % 4 AS INT) AS slot
         |FROM u""".stripMargin
    },
    "t_code_detect" -> {
      val kwList = Seq(
        "def", "class", "return", "import", "function", "var", "let",
        "const", "public", "void", "int", "if", "else", "for", "while",
        "struct", "fn").map(k => s"'$k'").mkString("[", ", ", "]")
      s"""WITH b AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 3 = 0 THEN
         |      'def f(x):' || chr(10) || '  return (x + 1);' || chr(10) ||
         |      '  if x { y = z[0]; }' || chr(10) || '  import os' ||
         |      chr(10) || substr(text, 1, 40)
         |    ELSE text END AS body
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, body,
         |    CAST(length(regexp_replace(body, '\\s', '', 'g')) AS BIGINT)
         |      AS nonws,
         |    CAST(length(regexp_replace(body, '[^{}()\\[\\];=<>]', '', 'g'))
         |      AS BIGINT) AS syms,
         |    string_split(body, chr(10)) AS lines,
         |    regexp_split_to_array(trim(body), '\\s+') AS ws
         |  FROM b),
         |sg AS (
         |  SELECT doc_id,
         |    CASE WHEN nonws = 0 THEN 0
         |      ELSE (syms * 1000000) // nonws END AS symbol_ppm,
         |    CASE WHEN len(lines) = 0 THEN 0
         |      ELSE (CAST(len(list_filter(lines,
         |        l -> regexp_matches(l, '^[ \\t]'))) AS BIGINT) * 1000000)
         |        // CAST(len(lines) AS BIGINT) END AS indent_ppm,
         |    CAST(len(list_filter(ws, w -> list_contains($kwList, w)))
         |      AS BIGINT) AS kw_hits
         |  FROM m)
         |SELECT doc_id, CAST(symbol_ppm AS BIGINT) AS symbol_ppm,
         |  CAST(indent_ppm AS BIGINT) AS indent_ppm, kw_hits,
         |  (symbol_ppm >= 60000 OR
         |    (indent_ppm >= 300000 AND kw_hits >= 3)) AS is_code
         |FROM sg""".stripMargin
    },
    // same regexp chain, same order (amp last), 'g' flag on every step
    "t_strip_html" -> {
      val html =
        "'<html><head><style>body { color: red; }</style>" +
          "<script type=\"text/javascript\">var x = 1 < 2;</script>" +
          "</head><body><h1 class=\"t\">Title ' || " +
          "CAST(doc_id % 7 AS VARCHAR) || '</h1><p>' || " +
          "substr(text, 1, 60) || ' &amp; more &lt;tags&gt; " +
          "&quot;q&quot; &#39;s&#39;&nbsp;end&amp;lt;</p><br/>" +
          "</body></html>'"
      s"""WITH h AS (SELECT doc_id, $html AS html FROM documents),
         |x AS (
         |  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
         |    html,
         |    '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
         |    '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
         |    '(?s)<[^>]*>', ' ', 'g') AS t
         |  FROM h),
         |e AS (
         |  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
         |    regexp_replace(regexp_replace(regexp_replace(
         |    t,
         |    '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
         |    '&#39;', CHR(39), 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g')
         |    AS t
         |  FROM x)
         |SELECT doc_id, trim(regexp_replace(t, '\\s+', ' ', 'g'))
         |  AS stripped
         |FROM e""".stripMargin
    },
    "t_sentences" -> {
      val stext =
        "'First bit ' || substr(text, 1, 30) || " +
          "'. Second part! Is this three? \"Quoted one.\" tail no punct'"
      s"""WITH m AS (
         |  SELECT doc_id,
         |    list_filter(list_transform(
         |      string_split(regexp_replace(trim($stext),
         |        '([.!?]["'')\\]]?)\\s+', '\\1' || chr(31), 'g'), chr(31)),
         |      x -> trim(x)), x -> x <> '') AS ss
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(unnest(range(0, len(ss))) AS INT) AS sentence_idx,
         |  unnest(ss) AS sentence
         |FROM m""".stripMargin
    },
    "t_unigram_vocab" -> {
      val rows = graft.ops.Unigram.Frozen
        .map { case (p, c) => s"('${p.replace("'", "''")}', $c)" }
        .mkString(", ")
      s"SELECT piece, CAST(cost AS INT) AS cost " +
        s"FROM (VALUES $rows) AS t(piece, cost)"
    },
    "t_unigram_encode" ->
      s"""WITH $unigramWordsCtes,
         |$unigramViterbiCtes,
         |ps AS (
         |  SELECT wo.doc_id, wo.word_idx,
         |    list_filter(string_split(u.path, chr(31)), x -> x <> '')
         |      AS pieces
         |  FROM words wo JOIN useg u ON wo.w = u.w)
         |SELECT doc_id, word_idx,
         |  CAST(unnest(range(0, len(pieces))) AS INT) AS piece_idx,
         |  unnest(pieces) AS piece
         |FROM ps""".stripMargin,
    "t_wordpiece_fertility" -> {
      val S = "\u001e"
      def sqlLit(s: String) = "'" + s.replace("'", "''") + "'"
      val init =
        "array_to_string(list_transform(string_split(w, ''), " +
          "c -> chr(30)||c||chr(30)), '')"
      val chain = graft.ops.Bpe.Frozen.foldLeft(init) { case (acc, (a, b)) =>
        s"replace($acc, ${sqlLit(S + a + S + S + b + S)}, ${sqlLit(S + a + b + S)})"
      }
      s"""WITH $unigramWordsCtes,
         |$wordpieceGreedyCtes,
         |wt AS (
         |  SELECT w,
         |    len(list_filter(string_split(path, chr(31)), x -> x <> ''))
         |      AS nwp
         |  FROM wseg),
         |bt AS (
         |  SELECT w, (length(e) - length(replace(e, chr(30), ''))) // 2
         |    AS nbpe
         |  FROM (SELECT w, $chain AS e FROM wdw)),
         |j AS (
         |  SELECT wo.lang, t.nwp, b.nbpe
         |  FROM words wo
         |  JOIN wt t ON wo.w = t.w
         |  JOIN bt b ON wo.w = b.w)
         |SELECT lang, CAST(count(*) AS BIGINT) AS total_words,
         |  CAST(sum(nwp) AS BIGINT) AS total_wordpiece,
         |  CAST(sum(nbpe) AS BIGINT) AS total_bpe,
         |  CAST((sum(nwp) * 1000000) // count(*) AS BIGINT)
         |    AS wordpiece_fertility_ppm,
         |  CAST((sum(nbpe) * 1000000) // count(*) AS BIGINT)
         |    AS bpe_fertility_ppm
         |FROM j GROUP BY lang""".stripMargin
    },
    "t_wordpiece" -> {
      val wordsCtes = unigramWordsCtes.replace(
        "words AS MATERIALIZED (",
        "wbase AS MATERIALIZED (")
      s"""WITH $wordsCtes,
         |words AS MATERIALIZED (
         |  SELECT doc_id, word_idx, w FROM wbase
         |  UNION ALL
         |  SELECT doc_id, CAST(-1 AS INT) AS word_idx,
         |    'x' || CAST(doc_id AS VARCHAR) AS w
         |  FROM documents),
         |$wordpieceGreedyCtes,
         |ps AS (
         |  SELECT wo.doc_id, wo.word_idx,
         |    list_filter(string_split(u.path, chr(31)), x -> x <> '')
         |      AS pieces
         |  FROM words wo JOIN wseg u ON wo.w = u.w)
         |SELECT doc_id, word_idx,
         |  CAST(unnest(range(0, len(pieces))) AS INT) AS piece_idx,
         |  unnest(pieces) AS piece
         |FROM ps""".stripMargin
    },
    "t_unigram_fertility" -> {
      val S = "\u001e"
      def sqlLit(s: String) = "'" + s.replace("'", "''") + "'"
      val init =
        "array_to_string(list_transform(string_split(w, ''), " +
          "c -> chr(30)||c||chr(30)), '')"
      val chain = graft.ops.Bpe.Frozen.foldLeft(init) { case (acc, (a, b)) =>
        s"replace($acc, ${sqlLit(S + a + S + S + b + S)}, ${sqlLit(S + a + b + S)})"
      }
      s"""WITH $unigramWordsCtes,
         |$unigramViterbiCtes,
         |bt AS (
         |  SELECT w, (length(e) - length(replace(e, chr(30), ''))) // 2
         |    AS nbpe
         |  FROM (SELECT w, $chain AS e FROM dw)),
         |j AS (
         |  SELECT wo.lang, u.ntok, b.nbpe
         |  FROM words wo
         |  JOIN useg u ON wo.w = u.w
         |  JOIN bt b ON wo.w = b.w)
         |SELECT lang, CAST(count(*) AS BIGINT) AS total_words,
         |  CAST(sum(ntok) AS BIGINT) AS total_unigram,
         |  CAST(sum(nbpe) AS BIGINT) AS total_bpe,
         |  CAST((sum(ntok) * 1000000) // count(*) AS BIGINT)
         |    AS unigram_fertility_ppm,
         |  CAST((sum(nbpe) * 1000000) // count(*) AS BIGINT)
         |    AS bpe_fertility_ppm
         |FROM j GROUP BY lang""".stripMargin
    },
    "t_strip_html_fuzz" ->
      s"""WITH ${fuzzDocsSql(HtmlFuzzFrags)},
         |x AS (
         |  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
         |    txt,
         |    '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
         |    '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
         |    '(?s)<[^>]*>', ' ', 'g') AS t
         |  FROM docs),
         |e AS (
         |  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
         |    regexp_replace(regexp_replace(regexp_replace(
         |    t,
         |    '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
         |    '&#39;', CHR(39), 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g')
         |    AS t
         |  FROM x)
         |SELECT doc_id, trim(regexp_replace(t, '\\s+', ' ', 'g'))
         |  AS stripped
         |FROM e""".stripMargin,
    "t_sentences_fuzz" ->
      s"""WITH ${fuzzDocsSql(SentenceFuzzFrags)},
         |m AS (
         |  SELECT doc_id,
         |    list_filter(list_transform(
         |      string_split(regexp_replace(trim(txt),
         |        '([.!?]["'')\\]]?)\\s+', '\\1' || chr(31), 'g'), chr(31)),
         |      x -> trim(x)), x -> x <> '') AS ss
         |  FROM docs)
         |SELECT doc_id,
         |  CAST(unnest(range(0, len(ss))) AS INT) AS sentence_idx,
         |  unnest(ss) AS sentence
         |FROM m""".stripMargin,
    "t_norm_answer_fuzz" ->
      s"""WITH ${fuzzDocsSql(NormFuzzFrags)}
         |SELECT doc_id,
         |  trim(regexp_replace(regexp_replace(regexp_replace(
         |    lower(txt),
         |    '[[:punct:]]', ' ', 'g'),
         |    '\\b(a|an|the)\\b', ' ', 'g'),
         |    '\\s+', ' ', 'g')) AS norm
         |FROM docs""".stripMargin,
    "t_scripts_fuzz" -> {
      val ppmCols = TextFunctions.ScriptClasses
        .map { case (n, body) =>
          s"""CASE WHEN length(txt) = 0 THEN CAST(0 AS BIGINT)
             |      ELSE ((length(txt) - length(regexp_replace(txt,
             |        '[$body]', '', 'g'))) * 1000000) // length(txt)
             |      END AS ${n}_ppm""".stripMargin
        }
        .mkString(",\n    ")
      val names = TextFunctions.ScriptClasses.map(_._1)
      val maxExpr = s"greatest(${names.map(n => s"${n}_ppm").mkString(", ")})"
      val domCase = names
        .map(n => s"WHEN ${n}_ppm = $maxExpr AND $maxExpr > 0 THEN '$n'")
        .mkString("\n    ")
      s"""WITH ${fuzzDocsSql(ScriptFuzzFrags)},
         |c AS (
         |  SELECT doc_id,
         |    $ppmCols
         |  FROM docs)
         |SELECT doc_id, ${names.map(n => s"${n}_ppm").mkString(", ")},
         |  CASE $domCase
         |    ELSE 'none' END AS dominant
         |FROM c""".stripMargin
    },
    "t_mojibake_fuzz" -> {
      def chrs(s: String) = s.map(c => s"chr(${c.toInt})").mkString(" || ")
      val mojiSum = TextFunctions.MojibakeSeqs
        .map(s =>
          s"(length(txt) - length(replace(txt, ${chrs(s)}, ''))) // ${s.length}")
        .mkString("\n      + ")
      s"""WITH ${fuzzDocsSql(MojibakeFuzzFrags)},
         |c AS (
         |  SELECT doc_id, CAST(length(txt) AS BIGINT) AS L,
         |    CAST(length(txt) - length(replace(txt, chr(65533), ''))
         |      AS BIGINT) AS n_replacement,
         |    CAST(length(txt) - length(regexp_replace(txt,
         |      '[\\x{0080}-\\x{009F}]', '', 'g')) AS BIGINT) AS n_c1,
         |    CAST($mojiSum AS BIGINT) AS n_moji
         |  FROM docs)
         |SELECT doc_id, n_replacement, n_c1, n_moji,
         |  CASE WHEN L = 0 THEN CAST(0 AS BIGINT)
         |    ELSE ((n_replacement + n_c1 + n_moji) * 1000000) // L END
         |    AS artifact_ppm,
         |  (n_replacement + n_c1 + n_moji) = 0 AS clean
         |FROM c""".stripMargin
    },
    "t_confusables_fuzz" -> {
      val from = graft.ops.TextFunctions.ConfusableFrom
      val to = graft.ops.TextFunctions.ConfusableTo
      s"""WITH ${fuzzDocsSql(ConfusableFuzzFrags)},
         |sk AS (
         |  SELECT doc_id, txt, translate(txt, '$from', '$to') AS skel
         |  FROM docs)
         |SELECT doc_id,
         |  ${hash61Sql("skel")} % 1000000007 AS skel_fp,
         |  CAST(length(txt) - length(skel) AS INT) AS n_stripped
         |FROM sk""".stripMargin
    },
    "t_oov_report" ->
      s"""WITH t AS (
         |  SELECT lang, unnest($WsSql) AS token FROM documents),
         |c AS (
         |  SELECT token, count(*) AS cnt FROM (
         |    SELECT unnest($WsSql) AS token FROM documents)
         |  GROUP BY token HAVING count(*) >= 2),
         |v AS (
         |  SELECT token FROM (
         |    SELECT token,
         |      row_number() OVER (ORDER BY cnt DESC, token ASC) AS rank
         |    FROM c) WHERE rank <= 100)
         |SELECT lang,
         |  CAST(count(*) AS BIGINT) AS total_tokens,
         |  CAST(count(v.token) AS BIGINT) AS in_vocab,
         |  CAST(count(*) - count(v.token) AS BIGINT) AS oov_tokens,
         |  CAST(((count(*) - count(v.token)) * 1000000) // count(*) AS BIGINT)
         |    AS oov_ppm
         |FROM t LEFT JOIN v ON t.token = v.token
         |GROUP BY lang""".stripMargin,
    // the six-op refresh composition, replayed as one CTE chain
    "p_refresh_e2e" ->
      s"""WITH o AS (SELECT doc_id, text FROM documents),
         |nn AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
         |  FROM documents WHERE doc_id % 7 <> 0
         |  UNION ALL
         |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 13 = 0),
         |todo AS (
         |  SELECT nn.doc_id, nn.text
         |  FROM nn LEFT JOIN o ON nn.doc_id = o.doc_id
         |  WHERE o.doc_id IS NULL OR md5(o.text) <> md5(nn.text)),
         |h AS (
         |  SELECT doc_id, '<html><body><p>' || text ||
         |    ' &amp; tail</p><script>var x = 1;</script></body></html>'
         |    AS html
         |  FROM todo),
         |x AS (
         |  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
         |    html,
         |    '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
         |    '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
         |    '(?s)<[^>]*>', ' ', 'g') AS t
         |  FROM h),
         |e AS (
         |  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
         |    regexp_replace(regexp_replace(regexp_replace(
         |    t,
         |    '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
         |    '&#39;', CHR(39), 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g')
         |    AS t
         |  FROM x),
         |c AS (
         |  SELECT doc_id,
         |    nfc_normalize(trim(regexp_replace(t, '\\s+', ' ', 'g'))) AS clean
         |  FROM e),
         |m AS (
         |  SELECT doc_id, clean,
         |    CAST(length(regexp_replace(clean, '\\s', '', 'g')) AS BIGINT)
         |      AS nonws,
         |    CAST(length(regexp_replace(clean, '[^{}()\\[\\];=<>]', '', 'g'))
         |      AS BIGINT) AS syms,
         |    string_split(clean, chr(10)) AS lines,
         |    regexp_split_to_array(trim(clean), '\\s+') AS ws
         |  FROM c),
         |p AS (
         |  SELECT doc_id, clean FROM m
         |  WHERE NOT (
         |    (CASE WHEN nonws = 0 THEN 0
         |       ELSE (syms * 1000000) // nonws END) >= 60000
         |    OR ((CASE WHEN len(lines) = 0 THEN 0
         |          ELSE (CAST(len(list_filter(lines,
         |            l -> regexp_matches(l, '^[ \\t]'))) AS BIGINT) * 1000000)
         |            // CAST(len(lines) AS BIGINT) END) >= 300000
         |        AND CAST(len(list_filter(ws, w -> list_contains(
         |          ['def', 'class', 'return', 'import', 'function', 'var',
         |           'let', 'const', 'public', 'void', 'int', 'if', 'else',
         |           'for', 'while', 'struct', 'fn'], w))) AS BIGINT) >= 3))),
         |r AS (
         |  SELECT md5(clean) AS fp, doc_id,
         |    ${hash61Sql("'prio:' || CAST(doc_id AS VARCHAR)")} % 1000 AS sc
         |  FROM p),
         |w AS (
         |  SELECT fp, doc_id, sc,
         |    row_number() OVER (PARTITION BY fp ORDER BY sc DESC, doc_id ASC)
         |      AS rn,
         |    count(*) OVER (PARTITION BY fp) AS n
         |  FROM r)
         |SELECT fp, doc_id AS doc_id_kept, CAST(sc AS BIGINT) AS score_kept,
         |  CAST(n AS BIGINT) AS n_copies
         |FROM w WHERE rn = 1""".stripMargin,
    "p_snapshot_diff" ->
      """WITH o AS (SELECT doc_id, md5(text) AS old_md5 FROM documents),
        |n AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END)
        |      AS new_md5
        |  FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, md5(text)
        |  FROM documents WHERE doc_id % 13 = 0)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.old_md5 = n.new_md5 THEN 'unchanged'
        |       ELSE 'changed' END AS status,
        |  o.old_md5, n.new_md5
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""".stripMargin,
    "p_dup_clusters" -> {
      // transitive closure over the verified near-dup pair graph; cluster
      // id = min doc id reachable. UNION (not ALL) bounds the recursion.
      s"""WITH RECURSIVE $minhashPairCtes,
         |pairs AS (
         |  SELECT id_a, id_b FROM verified WHERE i * 1.0 / u >= 0.5),
         |edges AS (
         |  SELECT id_a AS n, id_b AS m FROM pairs
         |  UNION ALL
         |  SELECT id_b AS n, id_a AS m FROM pairs),
         |reach(n, m) AS (
         |  SELECT n, m FROM edges
         |  UNION
         |  SELECT e.n, r.m FROM edges e JOIN reach r ON e.m = r.n)
         |SELECT n AS doc_id, least(n, min(m)) AS cluster_id
         |FROM reach GROUP BY n""".stripMargin
    },
    "p_cluster_sizes" -> {
      // the p_dup_clusters closure + two group-bys
      s"""WITH RECURSIVE $minhashPairCtes,
         |pairs AS (
         |  SELECT id_a, id_b FROM verified WHERE i * 1.0 / u >= 0.5),
         |edges AS (
         |  SELECT id_a AS n, id_b AS m FROM pairs
         |  UNION ALL
         |  SELECT id_b AS n, id_a AS m FROM pairs),
         |reach(n, m) AS (
         |  SELECT n, m FROM edges
         |  UNION
         |  SELECT e.n, r.m FROM edges e JOIN reach r ON e.m = r.n),
         |lbl AS (
         |  SELECT n AS doc_id, least(n, min(m)) AS cluster_id
         |  FROM reach GROUP BY n),
         |sz AS (
         |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS sz
         |  FROM lbl GROUP BY cluster_id)
         |SELECT sz AS cluster_size,
         |  CAST(count(*) AS BIGINT) AS n_clusters,
         |  CAST(sum(sz) AS BIGINT) AS n_docs
         |FROM sz GROUP BY sz""".stripMargin
    },
    "p_cc_star" -> {
      // same recursive-closure shape over the chain+hub fixture graph
      """WITH RECURSIVE pairs AS (
        |  SELECT doc_id AS id_a, doc_id + 1 AS id_b FROM documents
        |  WHERE doc_id % 100 <> 99
        |  UNION ALL
        |  SELECT doc_id, 0 FROM documents
        |  WHERE doc_id % 1000 = 0 AND doc_id <> 0),
        |edges AS (
        |  SELECT id_a AS n, id_b AS m FROM pairs
        |  UNION ALL
        |  SELECT id_b AS n, id_a AS m FROM pairs),
        |reach(n, m) AS (
        |  SELECT n, m FROM edges
        |  UNION
        |  SELECT e.n, r.m FROM edges e JOIN reach r ON e.m = r.n)
        |SELECT n AS doc_id, least(n, min(m)) AS cluster_id
        |FROM reach GROUP BY n""".stripMargin
    },
    "p_dedup_survivors" -> dedupSurvivorsOracle,
    // the exact-collapse-prefiltered variant is result-IDENTICAL by
    // construction \u2014 gated against the very same recursive oracle
    "p_dedup_survivors_fast" -> dedupSurvivorsOracle,
    "t_bigram_fluency" -> {
      // replays NgramLm.bigramFluency: integer-scaled conditional
      // probabilities (floor((c2*1e6)/c1) over exact counts) summed as
      // exact integers; one double division at the end. `//` (DuckDB) and
      // `div` (Spark) agree on positive integers.
      s"""WITH d AS (SELECT doc_id, $WsSql AS ws FROM documents),
         |bg AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, greatest(len(ws), 1)),
         |      i -> ws[i] || ' ' || ws[i+1])) AS bigram
         |  FROM d),
         |c2 AS (SELECT bigram, count(*) AS c2 FROM bg GROUP BY bigram),
         |c1 AS (SELECT split_part(bigram, ' ', 1) AS w1, count(*) AS c1
         |       FROM bg GROUP BY 1),
         |p AS (SELECT c2.bigram, (c2.c2 * 1000000) // c1.c1 AS micro
         |      FROM c2 JOIN c1 ON split_part(c2.bigram, ' ', 1) = c1.w1),
         |s AS (SELECT b.doc_id, count(*) AS n_bigrams,
         |        sum(p.micro) AS sum_micro
         |      FROM bg b JOIN p ON b.bigram = p.bigram
         |      GROUP BY b.doc_id)
         |SELECT doc_id, n_bigrams,
         |  CAST(sum_micro AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS fluency
         |FROM s""".stripMargin
    },
    // phrase replay: adjacent-position self-join over the positional
    // occurrence stream
    "t_phrase_search" ->
      s"""WITH w AS (
         |  SELECT doc_id, $WsSql AS ws FROM documents),
         |occ AS (
         |  SELECT doc_id,
         |    unnest(ws) AS term,
         |    CAST(unnest(range(1, len(ws)+1)) AS BIGINT) AS pos
         |  FROM w),
         |m AS (
         |  SELECT a.doc_id, a.pos AS start_pos
         |  FROM occ a JOIN occ b
         |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |  WHERE a.term = 'table' AND b.term = 'value')
         |SELECT doc_id, count(*) AS n_matches, min(start_pos) AS first_pos
         |FROM m GROUP BY doc_id""".stripMargin,
    // posting-list replay: parallel unnest zips terms with 1-based
    // positions; df counts rows of the collapsed (term, doc) table
    "t_postings" ->
      s"""WITH w AS (
         |  SELECT doc_id, $WsSql AS ws FROM documents),
         |occ AS (
         |  SELECT doc_id,
         |    unnest(ws) AS term,
         |    CAST(unnest(range(1, len(ws)+1)) AS BIGINT) AS pos
         |  FROM w),
         |post AS (
         |  SELECT term, doc_id, count(*) AS tf, min(pos) AS first_pos
         |  FROM occ GROUP BY term, doc_id),
         |d AS (SELECT term, count(*) AS df FROM post GROUP BY term)
         |SELECT post.term, doc_id, tf, first_pos, df
         |FROM post JOIN d ON post.term = d.term""".stripMargin,
    "t_tfidf" -> {
      // replays TfIdf.scoreDocs: integer-scaled rational idf
      // floor((n_docs*1e6)/df) \u2014 no logarithm, so no libm variance \u2014 with
      // exact long tf*idf weights and one double division at the end. df
      // counts rows of the (doc, term) table, i.e. documents per term.
      s"""WITH tok AS (
         |  SELECT doc_id, unnest($WsSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
         |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |idf AS (SELECT term, (n_docs * 1000000) // df AS idf FROM dfreq, n),
         |w AS (SELECT tf.doc_id, tf.tf, tf.tf * idf.idf AS weight
         |      FROM tf JOIN idf USING (term))
         |SELECT doc_id, count(*) AS n_terms,
         |  CAST(sum(tf) AS BIGINT) AS n_tokens,
         |  CAST(CAST(sum(weight) AS BIGINT) AS DOUBLE) /
         |    CAST(CAST(sum(tf) AS BIGINT) AS DOUBLE) AS tfidf
         |FROM w GROUP BY doc_id""".stripMargin
    },
    "t_keywords" -> {
      s"""WITH tok AS (
         |  SELECT doc_id, unnest($WsSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
         |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |idf AS (SELECT term, (n_docs * 1000000) // df AS idf FROM dfreq, n),
         |w AS (SELECT tf.doc_id, tf.term, tf.tf * idf.idf AS weight
         |      FROM tf JOIN idf USING (term)),
         |r AS (SELECT doc_id, term, weight,
         |        row_number() OVER (PARTITION BY doc_id
         |          ORDER BY weight DESC, term) AS rank
         |      FROM w)
         |SELECT doc_id, term, weight, rank FROM r WHERE rank <= 3""".stripMargin
    },
    // BM25 with rational idf: every score is exact integers flowing through
    // the IDENTICAL double expression tree on both engines (constants as
    // CAST(... AS DOUBLE) \u2014 a bare 1.2 literal is DECIMAL in DuckDB);
    // the per-doc sum folds in sorted term order on both sides
    "t_bm25_topk" -> {
      s"""WITH w AS (
         |  SELECT doc_id, $WsSql AS w FROM documents),
         |stats AS (SELECT count(*) AS d, sum(len(w)) AS t FROM w),
         |tf AS (
         |  SELECT doc_id, dl, term, count(*) AS tf FROM (
         |    SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM w)
         |  WHERE term IN ('spark', 'join', 'vector')
         |  GROUP BY doc_id, dl, term),
         |dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |sc AS (
         |  SELECT tf.doc_id, tf.term,
         |    CAST(((SELECT d FROM stats) + 1) * 1000000 // (dfr.df + 1) AS DOUBLE) *
         |    (tf.tf * (CAST(1.2 AS DOUBLE) + 1)) /
         |    (tf.tf + CAST(1.2 AS DOUBLE) * (1 - CAST(0.75 AS DOUBLE)) +
         |      CAST(1.2 AS DOUBLE) * CAST(0.75 AS DOUBLE) *
         |      (tf.dl / ((SELECT CAST(t AS DOUBLE) FROM stats) /
         |                (SELECT CAST(d AS DOUBLE) FROM stats)))) AS s
         |  FROM tf JOIN dfr USING (term)),
         |agg AS (
         |  SELECT doc_id, count(*) AS n_hits,
         |    list_reduce(list(s ORDER BY term), (a, b) -> a + b) AS score
         |  FROM sc GROUP BY doc_id),
         |r AS (
         |  SELECT doc_id, n_hits, score,
         |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT)
         |      AS rank
         |  FROM agg)
         |SELECT doc_id, n_hits, score, rank FROM r WHERE rank <= 200""".stripMargin
    },
    // Luhn replay: same planted fixture; checksum via a 1-based range
    // transform over the reversed candidate (Spark's 0-based transform
    // doubles odd indices; 1-based here doubles even \u2014 same digits)
    "t_card_audit" ->
      """WITH d2 AS (
        |  SELECT doc_id,
        |    text || ' pay ' ||
        |    CASE WHEN doc_id % 3 = 0 THEN '4111111111111111'
        |         WHEN doc_id % 3 = 1 THEN '4111111111111112'
        |         ELSE '12345678' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN ' 378282246310005' ELSE '' END ||
        |    ' end' AS t2
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, unnest(regexp_extract_all(t2, '\d{13,19}')) AS cand
        |  FROM d2),
        |v AS (
        |  SELECT doc_id, cand,
        |    CASE WHEN length(cand) BETWEEN 13 AND 19 AND
        |      list_sum(list_transform(range(1, length(cand) + 1), i ->
        |        CASE WHEN i % 2 = 0 THEN
        |          CASE WHEN CAST(substr(reverse(cand), i, 1) AS INT) * 2 > 9
        |               THEN CAST(substr(reverse(cand), i, 1) AS INT) * 2 - 9
        |               ELSE CAST(substr(reverse(cand), i, 1) AS INT) * 2 END
        |        ELSE CAST(substr(reverse(cand), i, 1) AS INT) END)) % 10 = 0
        |    THEN 1 ELSE 0 END AS ok
        |  FROM c)
        |SELECT d2.doc_id,
        |  CAST(count(v.cand) AS BIGINT) AS n_candidates,
        |  CAST(coalesce(sum(v.ok), 0) AS BIGINT) AS n_luhn_valid
        |FROM d2 LEFT JOIN v ON d2.doc_id = v.doc_id
        |GROUP BY d2.doc_id""".stripMargin,
    // novelty replay: even half's distinct grams vs each odd doc's set
    "t_novelty" ->
      s"""WITH rg AS (
         |  SELECT DISTINCT g FROM (
         |    SELECT unnest(${hashedShinglesSql(WsSql)}) AS g
         |    FROM documents WHERE doc_id % 2 = 0)),
         |d AS (
         |  SELECT doc_id, ${hashedShinglesSql(WsSql)} AS gr
         |  FROM documents WHERE doc_id % 2 = 1),
         |sh AS (
         |  SELECT doc_id, count(*) AS seen
         |  FROM (SELECT doc_id, unnest(gr) AS g FROM d) x
         |  JOIN rg USING (g) GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(len(gr) AS BIGINT) AS n_doc_ngrams,
         |  CAST(coalesce(seen, 0) AS BIGINT) AS n_seen_ngrams,
         |  CAST(CASE WHEN len(gr) = 0 THEN 0
         |    ELSE ((len(gr) - coalesce(seen, 0)) * 1000000) // len(gr) END
         |    AS BIGINT) AS novelty_ppm
         |FROM d LEFT JOIN sh ON d.doc_id = sh.doc_id""".stripMargin,
    // redirect replay: recursive per-hop walk capped at 16, last row per
    // src = position after min(16, resolution) hops \u2014 the doubling's
    // exact semantics; resolved = terminal has no outgoing edge
    "u_redirects" ->
      """WITH RECURSIVE raw AS (
        |  SELECT 'u' || CAST(doc_id AS VARCHAR) AS src,
        |    'u' || CAST(doc_id - 1 AS VARCHAR) AS dst
        |  FROM documents WHERE doc_id % 100 <> 0
        |  UNION ALL
        |  SELECT 'u' || CAST(doc_id AS VARCHAR),
        |    'z' || CAST(doc_id AS VARCHAR)
        |  FROM documents WHERE doc_id % 50 = 0 AND doc_id % 100 <> 0
        |  UNION ALL
        |  SELECT * FROM (VALUES ('cycA', 'cycB'), ('cycB', 'cycC'),
        |    ('cycC', 'cycA')) AS c(src, dst)),
        |m AS (SELECT src, min(dst) AS dst FROM raw GROUP BY src),
        |walk(src, cur, hops) AS (
        |  SELECT src, dst, 1 FROM m
        |  UNION ALL
        |  SELECT w.src, m.dst, w.hops + 1
        |  FROM walk w JOIN m ON w.cur = m.src
        |  WHERE w.hops < 16),
        |last AS (
        |  SELECT src, cur, hops FROM (
        |    SELECT *, row_number() OVER (PARTITION BY src
        |      ORDER BY hops DESC) AS rn
        |    FROM walk) WHERE rn = 1)
        |SELECT last.src, last.cur AS final_url,
        |  CAST(last.hops AS BIGINT) AS hops,
        |  CAST(CASE WHEN last.cur IN (SELECT src FROM m) THEN 0 ELSE 1 END
        |    AS BIGINT) AS resolved
        |FROM last""".stripMargin,
    // card fuzz replay: generated corpus + zipped-unnest candidate list +
    // the shared 1-based-range Luhn checksum
    "t_card_fuzz" -> {
      s"""WITH ${fuzzDocsSql(CardFuzzFrags)},
         |cl AS (
         |  SELECT doc_id, regexp_extract_all(txt, '\\d{13,19}') AS l
         |  FROM docs),
         |c AS (
         |  SELECT doc_id,
         |    CAST(unnest(range(1, len(l) + 1)) AS INT) - 1 AS cand_idx,
         |    unnest(l) AS cand
         |  FROM cl)
         |SELECT doc_id, cand_idx, cand,
         |  CAST(CASE WHEN length(cand) BETWEEN 13 AND 19 AND
         |    list_sum(list_transform(range(1, length(cand) + 1), i ->
         |      CASE WHEN i % 2 = 0 THEN
         |        CASE WHEN CAST(substr(reverse(cand), i, 1) AS INT) * 2 > 9
         |             THEN CAST(substr(reverse(cand), i, 1) AS INT) * 2 - 9
         |             ELSE CAST(substr(reverse(cand), i, 1) AS INT) * 2 END
         |      ELSE CAST(substr(reverse(cand), i, 1) AS INT) END)) % 10 = 0
         |  THEN 1 ELSE 0 END AS BIGINT) AS luhn_ok
         |FROM c""".stripMargin
    },
    // largest-remainder replay: floors + remainder ranking, \u03A3 = total
    "t_apportion" ->
      """WITH g AS (
        |  SELECT lang,
        |    CAST(sum(greatest(coalesce(length(text), 0), 0)) AS BIGINT)
        |      AS weight
        |  FROM documents GROUP BY lang),
        |tt AS (SELECT CAST(sum(weight) AS BIGINT) AS t FROM g),
        |sh AS (
        |  SELECT lang, weight,
        |    (weight * 1000) // (SELECT t FROM tt) AS floor_alloc,
        |    (weight * 1000) % (SELECT t FROM tt) AS rem
        |  FROM g),
        |nd AS (
        |  SELECT 1000 - CAST(sum(floor_alloc) AS BIGINT) AS need FROM sh),
        |r AS (
        |  SELECT *, row_number() OVER (ORDER BY rem DESC, lang ASC) AS rk
        |  FROM sh)
        |SELECT lang, weight, CAST(floor_alloc AS BIGINT) AS floor_alloc,
        |  CAST(CASE WHEN rk <= (SELECT need FROM nd) THEN 1 ELSE 0 END
        |    AS BIGINT) AS extra,
        |  CAST(floor_alloc +
        |    CASE WHEN rk <= (SELECT need FROM nd) THEN 1 ELSE 0 END
        |    AS BIGINT) AS n_alloc
        |FROM r""".stripMargin,
    // rendezvous replay: per-(doc, worker) hash scores, argmax by
    // (score DESC, worker DESC) \u2014 the op's documented tie order
    "t_rendezvous" -> {
      val ws = Seq("w0", "w1", "w2", "w3", "w4")
        .map(w => s"('$w')").mkString(", ")
      s"""WITH ws(w) AS (VALUES $ws),
         |sc AS (
         |  SELECT doc_id, w,
         |    ${hash61Sql("CAST(doc_id AS VARCHAR) || '|' || w")} AS s
         |  FROM documents CROSS JOIN ws)
         |SELECT doc_id, w AS worker FROM (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY s DESC, w DESC) AS rn
         |  FROM sc) WHERE rn = 1""".stripMargin
    },
    "t_rendezvous_moves" -> {
      def pick(workers: Seq[String], alias: String): String = {
        val ws = workers.map(w => s"('$w')").mkString(", ")
        s"""$alias AS (
           |  SELECT doc_id, w FROM (
           |    SELECT doc_id, w, row_number() OVER (PARTITION BY doc_id
           |      ORDER BY ${hash61Sql("CAST(doc_id AS VARCHAR) || '|' || w")}
           |        DESC, w DESC) AS rn
           |    FROM documents CROSS JOIN (VALUES $ws) AS ws(w))
           |  WHERE rn = 1)""".stripMargin
      }
      s"""WITH ${pick(Seq("w0", "w1", "w2", "w3", "w4"), "pa")},
         |${pick(Seq("w0", "w1", "w2", "w3", "w4", "w5"), "pb")},
         |j AS (
         |  SELECT CASE WHEN pa.w <> pb.w THEN 1 ELSE 0 END AS moved
         |  FROM pa JOIN pb ON pa.doc_id = pb.doc_id)
         |SELECT CAST(count(*) AS BIGINT) AS n_total,
         |  CAST(sum(moved) AS BIGINT) AS n_moved,
         |  CAST((sum(moved) * 1000000) // count(*) AS BIGINT) AS moved_ppm
         |FROM j""".stripMargin
    },
    // NDCG replay: the frozen discount table rendered as VALUES from the
    // SAME Scala constant; power(2, rel) is double-exact for rel <= 3
    "t_ndcg" -> {
      val rel = hash61Sql("'rel:' || CAST(doc_id AS VARCHAR)")
      val grade = hash61Sql("'grade:' || CAST(doc_id AS VARCHAR)")
      val sc = hash61Sql("'score:' || CAST(doc_id AS VARCHAR)")
      val discRows = graft.ops.RankEval.DiscountPpm.zipWithIndex
        .map { case (d, i) => s"(${i + 1}, $d)" }.mkString(", ")
      s"""WITH disc(r, d) AS (VALUES $discRows),
         |rels AS (
         |  SELECT doc_id % 20 AS query_id, doc_id AS dd,
         |    CAST($grade % 3 + 1 AS BIGINT) AS rel
         |  FROM documents WHERE $rel % 5 = 0),
         |run AS (
         |  SELECT query_id, dd,
         |    row_number() OVER (PARTITION BY query_id ORDER BY s DESC, dd)
         |      AS r
         |  FROM (SELECT doc_id % 20 AS query_id, doc_id AS dd, $sc AS s
         |        FROM documents)),
         |dcgq AS (
         |  SELECT run.query_id,
         |    sum((CAST(power(2, rels.rel) AS BIGINT) - 1) * disc.d) AS dcg
         |  FROM run
         |  JOIN rels ON run.query_id = rels.query_id AND run.dd = rels.dd
         |  JOIN disc ON disc.r = run.r
         |  WHERE run.r <= 10
         |  GROUP BY run.query_id),
         |ideal AS (
         |  SELECT query_id, rel,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY rel DESC, dd ASC) AS ir
         |  FROM rels),
         |idcgq AS (
         |  SELECT query_id,
         |    sum((CAST(power(2, rel) AS BIGINT) - 1) * disc.d) AS idcg
         |  FROM ideal JOIN disc ON disc.r = ideal.ir
         |  WHERE ir <= 10 GROUP BY query_id),
         |nr AS (
         |  SELECT query_id, count(*) AS n_rel FROM rels GROUP BY query_id)
         |SELECT nr.query_id, nr.n_rel,
         |  CAST(coalesce(dcg, 0) AS BIGINT) AS dcg,
         |  CAST(idcg AS BIGINT) AS idcg,
         |  CAST(CASE WHEN idcg = 0 THEN 0
         |    ELSE (coalesce(dcg, 0) * 1000000) // idcg END AS BIGINT)
         |    AS ndcg_ppm
         |FROM nr
         |JOIN idcgq USING (query_id)
         |LEFT JOIN dcgq USING (query_id)""".stripMargin
    },
    // rank-eval replay: identical hash-derived qrels/run fixture, then the
    // documented integer metric contract (per-term-floored AP, floor MRR)
    "t_rank_eval" -> {
      val rel = hash61Sql("'rel:' || CAST(doc_id AS VARCHAR)")
      val sc = hash61Sql("'score:' || CAST(doc_id AS VARCHAR)")
      s"""WITH rels AS (
         |  SELECT doc_id % 20 AS query_id, doc_id AS d FROM documents
         |  WHERE $rel % 5 = 0),
         |nrel AS (
         |  SELECT query_id, count(*) AS n_rel FROM rels GROUP BY query_id),
         |run AS (
         |  SELECT query_id, d,
         |    row_number() OVER (PARTITION BY query_id ORDER BY s DESC, d) AS r
         |  FROM (SELECT doc_id % 20 AS query_id, doc_id AS d, $sc AS s
         |        FROM documents)),
         |hits AS (
         |  SELECT run.query_id, run.r FROM run
         |  JOIN rels ON run.query_id = rels.query_id AND run.d = rels.d
         |  WHERE run.r <= 10),
         |j AS (
         |  SELECT query_id, r,
         |    row_number() OVER (PARTITION BY query_id ORDER BY r) AS j
         |  FROM hits),
         |per AS (
         |  SELECT query_id, count(*) AS n_hits_at_k, min(r) AS first,
         |    sum((1000000 * j) // r) AS apnum
         |  FROM j GROUP BY query_id)
         |SELECT nrel.query_id, n_rel,
         |  CAST(coalesce(n_hits_at_k, 0) AS BIGINT) AS n_hits_at_k,
         |  CAST(coalesce(first, 0) AS BIGINT) AS first_rank,
         |  CAST(CASE WHEN first IS NULL THEN 0
         |       ELSE 1000000 // first END AS BIGINT) AS rr_ppm,
         |  CAST(coalesce(apnum, 0) // n_rel AS BIGINT) AS ap_ppm
         |FROM nrel LEFT JOIN per ON nrel.query_id = per.query_id""".stripMargin
    },
    "p_simhash" -> {
      s"""WITH h AS (
         |  SELECT doc_id,
         |    list_transform(list_distinct($WsSql), w -> ${hash61Sql("w")}) AS hs
         |  FROM documents)
         |SELECT doc_id,
         |  list_reduce(list_transform(range(0, ${Dedup.SimhashBits}), i ->
         |    CASE WHEN list_reduce(list_transform(hs, x -> ((x >> i) & 1) * 2 - 1),
         |                          (acc, v) -> acc + v) > 0
         |         THEN (CAST(1 AS BIGINT) << i) ELSE 0 END),
         |    (acc, v) -> acc + v) AS simhash
         |FROM h""".stripMargin
    },
    "p_winnow_fingerprint" -> {
      s"""WITH d AS (
         |  SELECT doc_id,
         |    list_transform(
         |      list_transform(range(1, greatest(len($WsSql) - 1, 1)),
         |        i -> $WsSql[i] || ' ' || $WsSql[i+1] || ' ' || $WsSql[i+2]),
         |      s -> ${hash61Sql("s")}) AS hs
         |  FROM documents),
         |exploded AS (
         |  SELECT doc_id, unnest(hs) AS h,
         |    unnest(range(1, len(hs) + 1)) AS pos
         |  FROM d),
         |winned AS (
         |  SELECT doc_id,
         |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
         |  FROM exploded)
         |SELECT doc_id, count(DISTINCT wmin) AS n_fingerprints,
         |  min(wmin) AS min_fingerprint
         |FROM winned GROUP BY doc_id""".stripMargin
    },
    "t_bpe_tokens" -> {
      // Replay the frozen-merge ordered-sweep encode as a string-replace
      // chain. Each symbol is double-delimited with chr(30); both sides
      // split words on [\s\x1e]+ (Bpe.bpeWords and the regex below), so
      // the delimiter char can never survive inside a word and a merge
      // (a, b) is exactly replace('<s>a<s><s>b<s>' -> '<s>ab<s>'): the
      // delimiters make matches boundary-safe and left-to-right
      // non-overlapping replacement equals the encoder's left-to-right
      // merge sweep. Token count = half the delimiter count. Generated
      // from Bpe.Frozen so SQL and Scala cannot drift.
      val S = "\u001e"
      def sqlLit(s: String) = "'" + s.replace("'", "''") + "'"
      val init =
        "array_to_string(list_transform(string_split(w, ''), " +
          "c -> chr(30)||c||chr(30)), '')"
      val chain = graft.ops.Bpe.Frozen.foldLeft(init) { case (acc, (a, b)) =>
        s"replace($acc, ${sqlLit(S + a + S + S + b + S)}, ${sqlLit(S + a + b + S)})"
      }
      s"""WITH w AS (
         |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '[\\s\\x1e]+')) AS w
         |  FROM documents),
         |enc AS (
         |  SELECT doc_id, (length(e) - length(replace(e, chr(30), ''))) // 2 AS n
         |  FROM (SELECT doc_id, $chain AS e FROM w WHERE w <> '')),
         |agg AS (
         |  SELECT doc_id, sum(n) AS n FROM enc GROUP BY doc_id)
         |SELECT d.doc_id, CAST(coalesce(agg.n, 0) AS INT) AS n_bpe_tokens
         |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id""".stripMargin
    },
    "t_token_stats" -> {
      s"""SELECT doc_id,
         |  len($WsSql) AS n_tokens,
         |  len(list_distinct($WsSql)) AS n_uniq_tokens,
         |  len($WsSql) + list_reduce(
         |    list_transform($WsSql, w -> CAST(greatest(length(w) - 4, 0) // 4 AS BIGINT)),
         |    (acc, v) -> acc + v) AS n_bpe_est,
         |  list_reduce(list_transform($WsSql, w -> CAST(length(w) AS BIGINT)),
         |    (acc, v) -> acc + v) * 1.0 / len($WsSql) AS mean_token_len
         |FROM documents""".stripMargin
    },
    "t_stopword_prune" -> {
      s"""WITH hist AS (
         |  SELECT w, count(*) AS n
         |  FROM (SELECT unnest($WsSql) AS w FROM documents)
         |  GROUP BY w ORDER BY n DESC, w ASC LIMIT 20
         |), top AS (SELECT list(w) AS tw FROM hist)
         |SELECT doc_id,
         |  len(ws0) AS n_tokens,
         |  len(list_filter(ws0, x -> NOT list_contains(tw, x))) AS n_kept
         |FROM (SELECT doc_id, $WsSql AS ws0 FROM documents) d
         |CROSS JOIN top""".stripMargin
    },
    "t_hash_sample" -> {
      s"""SELECT doc_id,
         |  ${hash61Sql("CAST(doc_id AS VARCHAR)")} % 100 AS bucket
         |FROM documents
         |WHERE ${hash61Sql("CAST(doc_id AS VARCHAR)")} % 100 < 10""".stripMargin
    },
    "t_stratified_sample" -> {
      val cases = StratifiedRates
        .map { case (k, r) => s"WHEN lang = '$k' THEN $r" }
        .mkString(" ")
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${hash61Sql("CAST(doc_id AS VARCHAR)")} % 1000 <
         |  CASE $cases ELSE $StratifiedDefault END""".stripMargin
    },
    "t_contig_windows" ->
      s"""WITH d AS (
         |  SELECT doc_id, CAST(len($WsSql) AS BIGINT) AS n FROM documents),
         |o AS (
         |  SELECT doc_id, n,
         |    CAST(coalesce(sum(n) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS tok_start
         |  FROM d)
         |SELECT doc_id, n AS n_tokens, tok_start,
         |  tok_start // 128 AS first_window,
         |  (tok_start + n - 1) // 128 AS last_window,
         |  tok_start - (tok_start // 128) * 128 AS offset_in_first
         |FROM o""".stripMargin,
    "t_global_shuffle" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    ${hash61Sql("'shuffle:' || CAST(doc_id AS VARCHAR)")} AS hk
         |  FROM documents),
         |p AS (
         |  SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY hk, doc_id) - 1 AS BIGINT)
         |      AS pos
         |  FROM h)
         |SELECT doc_id, pos, pos // 64 AS shard FROM p""".stripMargin,
    // stratified k-fold replay: per-lang hashed rank mod 5
    "t_kfold" ->
      s"""SELECT doc_id, lang,
         |  CAST((row_number() OVER (PARTITION BY lang
         |    ORDER BY ${hash61Sql("'fold:' || CAST(doc_id AS VARCHAR)")},
         |    doc_id) - 1) % 5 AS INT) AS fold
         |FROM documents""".stripMargin,
    // IQR fences replayed with quantile_disc (= exactQuantiles' pinned
    // rank semantics); the fence arithmetic mirrors the Spark tree:
    // CAST(q AS DOUBLE) -/+ 1.5 * CAST(q3 - q1 AS DOUBLE)
    "t_iqr_filter" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 97 = 0 THEN n_chars * 50 ELSE n_chars END
        |      AS metric
        |  FROM documents),
        |f AS (
        |  SELECT quantile_disc(metric, 0.25) AS q1,
        |    quantile_disc(metric, 0.75) AS q3
        |  FROM m)
        |SELECT doc_id, metric FROM m, f
        |WHERE CAST(metric AS DOUBLE) >=
        |    CAST(q1 AS DOUBLE) - 1.5 * CAST(q3 - q1 AS DOUBLE)
        |  AND CAST(metric AS DOUBLE) <=
        |    CAST(q3 AS DOUBLE) + 1.5 * CAST(q3 - q1 AS DOUBLE)""".stripMargin,
    // fractional-progress interleave replay: per-source hashed rank and
    // size, global order by (p/n double, source, p) \u2014 the same two exact
    // longs divide on both engines
    "t_interleave" ->
      s"""WITH src AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 10 < 7 THEN 's0'
         |         WHEN doc_id % 10 < 9 THEN 's1' ELSE 's2' END AS source,
         |    ${hash61Sql("'interleave:' || CAST(doc_id AS VARCHAR)")} AS hk
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, source,
         |    row_number() OVER (PARTITION BY source ORDER BY hk, doc_id)
         |      AS ip,
         |    count(*) OVER (PARTITION BY source) AS n
         |  FROM src)
         |SELECT doc_id, source,
         |  CAST(row_number() OVER (
         |    ORDER BY CAST(ip AS DOUBLE) / CAST(n AS DOUBLE), source, ip)
         |    - 1 AS BIGINT) AS pos
         |FROM p""".stripMargin,
    // depth-bounded recursive walk: min(depth) per reached node; the
    // bound (depth < 4) caps path length so the CTE terminates on the
    // cyclic graph, and min() collapses the path multiset to BFS layers
    "u_crawl_depth" ->
      """WITH RECURSIVE edges AS (
        |  SELECT doc_id AS src,
        |    (doc_id * 7 + 3) % (SELECT count(*) FROM documents) AS dst
        |  FROM documents
        |  UNION ALL SELECT doc_id,
        |    (doc_id * 13 + 5) % (SELECT count(*) FROM documents)
        |  FROM documents
        |  UNION ALL SELECT doc_id, doc_id % 37 FROM documents
        |  WHERE doc_id % 5 = 0),
        |walk(node, depth) AS (
        |  SELECT doc_id, 0 FROM documents WHERE doc_id % 97 = 0
        |  UNION ALL
        |  SELECT e.dst, w.depth + 1
        |  FROM walk w JOIN edges e ON e.src = w.node
        |  WHERE w.depth < 4)
        |SELECT node, CAST(min(depth) AS INTEGER) AS depth
        |FROM walk GROUP BY node""".stripMargin,
    "u_pagerank" -> pagerankSql(
      """SELECT doc_id AS src,
        |    (doc_id * 7 + 3) % (SELECT count(*) FROM documents) AS dst
        |  FROM documents
        |  UNION ALL SELECT doc_id,
        |    (doc_id * 13 + 5) % (SELECT count(*) FROM documents)
        |  FROM documents
        |  UNION ALL SELECT doc_id, doc_id % 37 FROM documents
        |  WHERE doc_id % 5 = 0""".stripMargin,
      iters = 5),
    "u_hits" -> hitsSql(
      """SELECT doc_id AS src,
        |    (doc_id * 7 + 3) % (SELECT count(*) FROM documents) AS dst
        |  FROM documents
        |  UNION ALL SELECT doc_id,
        |    (doc_id * 13 + 5) % (SELECT count(*) FROM documents)
        |  FROM documents
        |  UNION ALL SELECT doc_id, doc_id % 37 FROM documents
        |  WHERE doc_id % 5 = 0""".stripMargin,
      iters = 5),
    "u_trustrank" -> trustrankSql(
      """SELECT doc_id AS src,
        |    (doc_id * 7 + 3) % (SELECT count(*) FROM documents) AS dst
        |  FROM documents
        |  UNION ALL SELECT doc_id,
        |    (doc_id * 13 + 5) % (SELECT count(*) FROM documents)
        |  FROM documents
        |  UNION ALL SELECT doc_id, doc_id % 37 FROM documents
        |  WHERE doc_id % 5 = 0""".stripMargin,
      seedPred = "node % 50 = 0",
      iters = 5),
    // canonical a<b wedges closed against the canonical edge set; each
    // triangle credits its three corners once
    "u_triangles" ->
      """WITH raw AS (
        |  SELECT doc_id AS src,
        |    (doc_id * 7 + 3) % (SELECT count(*) FROM documents) AS dst
        |  FROM documents
        |  UNION ALL SELECT doc_id,
        |    (doc_id * 13 + 5) % (SELECT count(*) FROM documents)
        |  FROM documents
        |  UNION ALL SELECT doc_id, doc_id % 37 FROM documents
        |  WHERE doc_id % 5 = 0),
        |e AS (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM raw WHERE src <> dst),
        |tr AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1
        |  JOIN e e2 ON e1.b = e2.a
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
        |SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
        |FROM (
        |  SELECT x AS node FROM tr
        |  UNION ALL SELECT y FROM tr
        |  UNION ALL SELECT z FROM tr)
        |GROUP BY node""".stripMargin,
    // degrees + triangles over the same canonical edges; cc = exact
    // integer-ppm floor quotient (both engines' integral division)
    "u_clustering" ->
      """WITH raw AS (
        |  SELECT doc_id AS src,
        |    (doc_id * 7 + 3) % (SELECT count(*) FROM documents) AS dst
        |  FROM documents
        |  UNION ALL SELECT doc_id,
        |    (doc_id * 13 + 5) % (SELECT count(*) FROM documents)
        |  FROM documents
        |  UNION ALL SELECT doc_id, doc_id % 37 FROM documents
        |  WHERE doc_id % 5 = 0),
        |e AS (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM raw WHERE src <> dst),
        |deg AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
        |    SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        |  GROUP BY node),
        |tr AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1
        |  JOIN e e2 ON e1.b = e2.a
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |tc AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
        |    SELECT x AS node FROM tr
        |    UNION ALL SELECT y FROM tr
        |    UNION ALL SELECT z FROM tr)
        |  GROUP BY node)
        |SELECT d.node, d.degree,
        |  CAST(coalesce(tc.n_triangles, 0) AS BIGINT) AS n_triangles,
        |  CAST(CASE WHEN d.degree >= 2
        |    THEN (coalesce(tc.n_triangles, 0) * 2000000)
        |      // (d.degree * (d.degree - 1))
        |    ELSE 0 END AS BIGINT) AS cc_ppm
        |FROM deg d LEFT JOIN tc ON d.node = tc.node""".stripMargin,
    "u_degree_dist" ->
      """WITH e AS (
        |  SELECT doc_id AS src,
        |    (doc_id * 7 + 3) % (SELECT count(*) FROM documents) AS dst
        |  FROM documents
        |  UNION ALL SELECT doc_id,
        |    (doc_id * 13 + 5) % (SELECT count(*) FROM documents)
        |  FROM documents
        |  UNION ALL SELECT doc_id, doc_id % 37 FROM documents
        |  WHERE doc_id % 5 = 0),
        |nodes AS (SELECT DISTINCT node FROM (
        |  SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
        |od AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d
        |  FROM e GROUP BY src),
        |idg AS (SELECT dst AS node, CAST(count(*) AS BIGINT) AS d
        |  FROM e GROUP BY dst),
        |sides AS (
        |  SELECT 'out' AS direction, coalesce(od.d, 0) AS d
        |  FROM nodes LEFT JOIN od ON nodes.node = od.node
        |  UNION ALL
        |  SELECT 'in', coalesce(idg.d, 0)
        |  FROM nodes LEFT JOIN idg ON nodes.node = idg.node)
        |SELECT direction, CAST(length(bin(d)) AS INT) AS bucket,
        |  count(*) AS n_nodes, CAST(sum(d) AS BIGINT) AS total_degree,
        |  min(d) AS min_degree, max(d) AS max_degree
        |FROM sides GROUP BY 1, 2""".stripMargin,
    // crawl-scope replay: the u_link_authority extraction CTEs feed a
    // DISTINCT domain edge list; depth-bounded recursive walk from the
    // three seed domains; docs join their own domain's min depth
    "u_crawl_scope" ->
      s"""WITH RECURSIVE h AS (
         |  SELECT doc_id,
         |    '<p>' || text || '</p><a href="' ||
         |      'https://www.d' || CAST(doc_id % 37 AS VARCHAR) ||
         |      '.co.uk/p' || CAST(doc_id AS VARCHAR) ||
         |    '">x</a> <nav><a href="' ||
         |      'http://blog.d' || CAST(doc_id % 41 AS VARCHAR) ||
         |      '.com/q?id=' || CAST(doc_id AS VARCHAR) ||
         |    '">y</a></nav>' AS html
         |  FROM documents),
         |u AS (
         |  SELECT doc_id,
         |    unnest(regexp_extract_all(html, 'href="([^"]+)"', 1)) AS url
         |  FROM h),
         |$UrlParseCtes,
         |edges AS (
         |  SELECT DISTINCT
         |    'd' || CAST(doc_id % 50 AS VARCHAR) || '.com' AS src,
         |    domain AS dst
         |  FROM dm),
         |walk(node, depth) AS (
         |  SELECT 'd' || CAST(range AS VARCHAR) || '.com', 0 FROM range(0, 3)
         |  UNION ALL
         |  SELECT e.dst, w.depth + 1
         |  FROM walk w JOIN edges e ON e.src = w.node
         |  WHERE w.depth < 2),
         |mind AS (
         |  SELECT node, CAST(min(depth) AS INTEGER) AS depth
         |  FROM walk GROUP BY node)
         |SELECT doc_id,
         |  'd' || CAST(doc_id % 50 AS VARCHAR) || '.com' AS domain,
         |  depth
         |FROM documents JOIN mind
         |  ON ('d' || CAST(doc_id % 50 AS VARCHAR) || '.com') = mind.node""".stripMargin,

    // anchor-text replay: whole-element extraction keeps url/text aligned;
    // UrlParseCtes passes the atext column through (SELECT u.*)
    "u_anchor_text" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    '<p>' || text || '</p><a href="' ||
         |      'https://www.d' || CAST(doc_id % 37 AS VARCHAR) ||
         |      '.co.uk/p' || CAST(doc_id AS VARCHAR) ||
         |    '">' || substr(text, 1, 20) ||
         |    '</a> <nav><a href="' ||
         |      'http://blog.d' || CAST(doc_id % 41 AS VARCHAR) ||
         |      '.com/q?id=' || CAST(doc_id AS VARCHAR) ||
         |    '">more ' || substr(text, 21, 12) || '</a></nav>' AS html
         |  FROM documents),
         |ae AS (
         |  SELECT doc_id,
         |    unnest(regexp_extract_all(html,
         |      '<a\\s[^>]*href="[^"]*"[^>]*>[^<]*</a>', 0)) AS e
         |  FROM h),
         |u AS (
         |  SELECT doc_id,
         |    regexp_extract(e, 'href="([^"]*)"', 1) AS url,
         |    regexp_extract(e, '>([^<]*)</a>', 1) AS atext
         |  FROM ae),
         |$UrlParseCtes,
         |terms AS (
         |  SELECT domain,
         |    unnest(regexp_split_to_array(trim(atext), '\\s+')) AS term
         |  FROM dm)
         |SELECT domain, term, count(*) AS n_mentions
         |FROM terms WHERE term <> '' GROUP BY domain, term""".stripMargin,

    // real-anchor authority: html fixture \u2192 href unnest \u2192 UrlParseCtes
    // registered domains \u2192 the same generated pagerank replay
    "u_link_authority" -> pagerankSql(
      """SELECT 'd' || CAST(doc_id % 50 AS VARCHAR) || '.com' AS src,
        |    domain AS dst
        |  FROM dm""".stripMargin,
      iters = 3,
      preCtes =
        s"""h AS (
           |  SELECT doc_id,
           |    '<p>' || text || '</p><a href="' ||
           |      'https://www.d' || CAST(doc_id % 37 AS VARCHAR) ||
           |      '.co.uk/p' || CAST(doc_id AS VARCHAR) ||
           |    '">x</a> <nav><a href="' ||
           |      'http://blog.d' || CAST(doc_id % 41 AS VARCHAR) ||
           |      '.com/q?id=' || CAST(doc_id AS VARCHAR) ||
           |    '">y</a></nav>' AS html
           |  FROM documents),
           |u AS (
           |  SELECT doc_id,
           |    unnest(regexp_extract_all(html, 'href="([^"]+)"', 1)) AS url
           |  FROM h),
           |$UrlParseCtes,
           |""".stripMargin),
    "u_pagerank_dangling" -> pagerankSql(
      """SELECT doc_id AS src,
        |    (doc_id * 7 + 3) % (SELECT count(*) FROM documents) AS dst
        |  FROM documents WHERE doc_id % 3 <> 0
        |  UNION ALL SELECT doc_id,
        |    (doc_id * 13 + 5) % (SELECT count(*) FROM documents)
        |  FROM documents WHERE doc_id % 3 <> 0""".stripMargin,
      iters = 4,
      redistributeDangling = true),

    // host-level authority: same pagerank replay over the registered-
    // domain multigraph of the synthetic link frame (urlDomain of
    // www.dK.com = dK.com; K = doc_id % 50 / target formulas as in the
    // Spark gate)
    "u_host_rank" -> pagerankSql(
      """SELECT 'd' || CAST(doc_id % 50 AS VARCHAR) || '.com' AS src,
        |    'd' || CAST(((doc_id * 7 + 3) %
        |      (SELECT count(*) FROM documents)) % 37 AS VARCHAR) || '.com'
        |      AS dst
        |  FROM documents
        |  UNION ALL
        |  SELECT 'd' || CAST(doc_id % 50 AS VARCHAR) || '.com',
        |    'd' || CAST(((doc_id * 13 + 5) %
        |      (SELECT count(*) FROM documents)) % 41 AS VARCHAR) || '.com'
        |  FROM documents""".stripMargin,
      iters = 3),
    "t_lang_fertility" ->
      s"""WITH b AS (
         |  SELECT lang, length(text) AS nchars, $WsSql AS ws FROM documents),
         |d AS (
         |  SELECT lang, nchars, CAST(len(ws) AS BIGINT) AS nw,
         |    CAST(len(ws) AS BIGINT) + CAST(list_sum(list_transform(ws,
         |      x -> CAST(floor(greatest(length(x) - 4, 0) / 4.0) AS BIGINT)))
         |      AS BIGINT) AS nbpe
         |  FROM b),
         |a AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(nw) AS BIGINT) AS total_words,
         |    CAST(sum(nbpe) AS BIGINT) AS total_bpe_est,
         |    CAST(sum(nchars) AS BIGINT) AS total_chars
         |  FROM d GROUP BY lang)
         |SELECT lang, n_docs, total_words, total_bpe_est, total_chars,
         |  CAST(total_bpe_est AS DOUBLE) / CAST(total_words AS DOUBLE)
         |    AS fertility,
         |  CAST(total_chars AS DOUBLE) / CAST(total_bpe_est AS DOUBLE)
         |    AS chars_per_token
         |FROM a""".stripMargin,
    "t_sql_surface" -> {
      val hitExprs = TextFunctions.LangProfiles.map { case (lang, sw) =>
        val arr = sw.map(s => s"'$s'").mkString("[", ", ", "]")
        s"len(list_filter(ws, w -> list_contains($arr, w))) AS h_$lang"
      }
      val langs = TextFunctions.LangProfiles.map(_._1)
      val maxExpr = s"greatest(${langs.map("h_" + _).mkString(", ")})"
      val chain = langs
        .map(l => s"WHEN h_$l = mx AND mx > 0 THEN '$l'")
        .mkString(" ")
      val normSql =
        """trim(regexp_replace(regexp_replace(regexp_replace(
          |    lower(text), '[[:punct:]]', ' ', 'g'),
          |    '\b(a|an|the)\b', ' ', 'g'),
          |    '\s+', ' ', 'g'))""".stripMargin
      s"""WITH b AS (
         |  SELECT doc_id, text, $WsSql AS ws FROM documents),
         |scored AS (
         |  SELECT doc_id, text, ws, ${hitExprs.mkString(", ")} FROM b),
         |mxd AS (
         |  SELECT *, $maxExpr AS mx FROM scored)
         |SELECT doc_id,
         |  CASE $chain ELSE 'und' END AS lang_pred,
         |  CAST(len(ws) AS INT) AS n_tokens,
         |  ${hash61Sql(normSql)} AS norm_hash
         |FROM mxd""".stripMargin
    },
    "t_temperature_mix" -> {
      s"""WITH cnt AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents
         |  GROUP BY lang),
         |tot AS (
         |  SELECT CAST(sum(n) AS BIGINT) AS total_n,
         |    list_reduce(list_transform(list(n ORDER BY lang),
         |      x -> sqrt(CAST(x AS DOUBLE))), (a, v) -> a + v) AS sumsqrt
         |  FROM cnt),
         |rates AS (
         |  SELECT lang,
         |    CAST(floor((1000.0 * sqrt(CAST(n AS DOUBLE)) *
         |      CAST(total_n AS DOUBLE))
         |      / (sumsqrt * CAST(n AS DOUBLE))) AS BIGINT) AS pm
         |  FROM cnt, tot),
         |w AS (
         |  SELECT d.doc_id, d.lang, r.pm,
         |    ${hash61Sql("'mix:' || CAST(doc_id AS VARCHAR)")} % 1000 AS b
         |  FROM documents d JOIN rates r USING (lang))
         |SELECT doc_id, lang,
         |  unnest(range((pm // 1000) +
         |    (CASE WHEN b < pm % 1000 THEN 1 ELSE 0 END))) AS copy
         |FROM w""".stripMargin
    },
    "t_word_diversity" ->
      s"""WITH b AS (SELECT doc_id, $WsSql AS ws FROM documents)
         |SELECT doc_id,
         |  CASE WHEN len(ws) > 0 THEN
         |    CAST(list_sum(list_transform(range(1, len(ws) + 1),
         |      i -> len(list_filter(ws, x -> x = ws[i])))) AS DOUBLE) /
         |    (CAST(len(ws) AS DOUBLE) * CAST(len(ws) AS DOUBLE))
         |  END AS concentration,
         |  1.0 - (CASE WHEN len(ws) > 0 THEN
         |    CAST(list_sum(list_transform(range(1, len(ws) + 1),
         |      i -> len(list_filter(ws, x -> x = ws[i])))) AS DOUBLE) /
         |    (CAST(len(ws) AS DOUBLE) * CAST(len(ws) AS DOUBLE))
         |  END) AS diversity
         |FROM b""".stripMargin,
    // replays Bm25 (k=200) + the cosine ranking for query vector 0
    // (k=200), then the RRF fuse: integer 1e6 // (60 + rank)
    // contributions summed exactly, top-100 by (score desc, id)
    "s_hybrid_rrf" -> {
      def dotSql(x: String, y: String) =
        s"list_reduce(list_transform(range(1, len($x) + 1), " +
          s"i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)), (acc, v) -> acc + v)"
      s"""WITH w AS (
         |  SELECT doc_id, $WsSql AS w FROM documents),
         |stats AS (SELECT count(*) AS d, sum(len(w)) AS t FROM w),
         |tf AS (
         |  SELECT doc_id, dl, term, count(*) AS tf FROM (
         |    SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM w)
         |  WHERE term IN ('spark', 'join', 'vector')
         |  GROUP BY doc_id, dl, term),
         |dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |sc AS (
         |  SELECT tf.doc_id, tf.term,
         |    CAST(((SELECT d FROM stats) + 1) * 1000000 // (dfr.df + 1) AS DOUBLE) *
         |    (tf.tf * (CAST(1.2 AS DOUBLE) + 1)) /
         |    (tf.tf + CAST(1.2 AS DOUBLE) * (1 - CAST(0.75 AS DOUBLE)) +
         |      CAST(1.2 AS DOUBLE) * CAST(0.75 AS DOUBLE) *
         |      (tf.dl / ((SELECT CAST(t AS DOUBLE) FROM stats) /
         |                (SELECT CAST(d AS DOUBLE) FROM stats)))) AS s
         |  FROM tf JOIN dfr USING (term)),
         |agg AS (
         |  SELECT doc_id, list_reduce(list(s ORDER BY term), (a, b) -> a + b)
         |    AS score
         |  FROM sc GROUP BY doc_id),
         |sparse AS (
         |  SELECT doc_id,
         |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank
         |  FROM agg QUALIFY rank <= 200),
         |dq AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |dc AS (SELECT vec_id, embedding AS cv FROM embeddings
         |       WHERE vec_id <> 0),
         |ds AS (
         |  SELECT vec_id,
         |    ${dotSql("qv", "cv")} /
         |      (sqrt(${dotSql("qv", "qv")}) * sqrt(${dotSql("cv", "cv")})) AS cos
         |  FROM dc, dq),
         |dense AS (
         |  SELECT vec_id AS doc_id,
         |    row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS rank
         |  FROM ds QUALIFY rank <= 200),
         |contrib AS (
         |  SELECT doc_id, 1000000 // (60 + rank) AS c FROM sparse
         |  UNION ALL
         |  SELECT doc_id, 1000000 // (60 + rank) AS c FROM dense),
         |fused AS (
         |  SELECT doc_id, count(*) AS n_lists,
         |    CAST(sum(c) AS BIGINT) AS rrf_micro
         |  FROM contrib GROUP BY doc_id),
         |fr AS (
         |  SELECT doc_id, n_lists, rrf_micro,
         |    CAST(row_number() OVER (ORDER BY rrf_micro DESC, doc_id) AS INT)
         |      AS rank
         |  FROM fused)
         |SELECT doc_id, n_lists, rrf_micro, rank FROM fr
         |WHERE rank <= 100""".stripMargin
    },
    // replays the full retrieval chain in one CTE pipeline: postings-df
    // term pick -> BM25 (rational idf, ordered fold) -> RRF fusion with
    // the dense cosine ranking -> per-bucket rank-eval metrics
    "p_retrieval_e2e" -> {
      val rel = hash61Sql("'rel:' || CAST(doc_id AS VARCHAR)")
      s"""WITH w AS (
         |  SELECT doc_id, $WsSql AS w FROM documents),
         |stats AS (SELECT count(*) AS d, sum(len(w)) AS t FROM w),
         |post AS (
         |  SELECT term, doc_id FROM (
         |    SELECT doc_id, unnest(w) AS term FROM w) GROUP BY term, doc_id),
         |dfall AS (SELECT term, count(*) AS df FROM post GROUP BY term),
         |picked AS (SELECT term FROM dfall ORDER BY df ASC, term ASC LIMIT 3),
         |tf AS (
         |  SELECT doc_id, dl, term, count(*) AS tf FROM (
         |    SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM w)
         |  WHERE term IN (SELECT term FROM picked)
         |  GROUP BY doc_id, dl, term),
         |dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |sc AS (
         |  SELECT tf.doc_id, tf.term,
         |    CAST(((SELECT d FROM stats) + 1) * 1000000 // (dfr.df + 1) AS DOUBLE) *
         |    (tf.tf * (CAST(1.2 AS DOUBLE) + 1)) /
         |    (tf.tf + CAST(1.2 AS DOUBLE) * (1 - CAST(0.75 AS DOUBLE)) +
         |      CAST(1.2 AS DOUBLE) * CAST(0.75 AS DOUBLE) *
         |      (tf.dl / ((SELECT CAST(t AS DOUBLE) FROM stats) /
         |                (SELECT CAST(d AS DOUBLE) FROM stats)))) AS s
         |  FROM tf JOIN dfr USING (term)),
         |agg AS (
         |  SELECT doc_id, list_reduce(list(s ORDER BY term), (a, b) -> a + b)
         |    AS score
         |  FROM sc GROUP BY doc_id),
         |sparse AS (
         |  SELECT doc_id,
         |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank
         |  FROM agg QUALIFY rank <= 200),
         |dq AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |dc AS (SELECT vec_id, embedding AS cv FROM embeddings
         |       WHERE vec_id <> 0),
         |ds AS (
         |  SELECT vec_id,
         |    ${embDotSql("qv", "cv")} /
         |      (sqrt(${embDotSql("qv", "qv")}) * sqrt(${embDotSql("cv", "cv")})) AS cos
         |  FROM dc, dq),
         |dense AS (
         |  SELECT vec_id AS doc_id,
         |    row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS rank
         |  FROM ds QUALIFY rank <= 200),
         |contrib AS (
         |  SELECT doc_id, 1000000 // (60 + rank) AS c FROM sparse
         |  UNION ALL
         |  SELECT doc_id, 1000000 // (60 + rank) AS c FROM dense),
         |fused AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS rrf_micro
         |  FROM contrib GROUP BY doc_id),
         |fr AS (
         |  SELECT doc_id,
         |    row_number() OVER (ORDER BY rrf_micro DESC, doc_id) AS rank
         |  FROM fused QUALIFY rank <= 100),
         |run AS (
         |  SELECT doc_id % 5 AS query_id, doc_id AS d,
         |    row_number() OVER (PARTITION BY doc_id % 5 ORDER BY rank) AS r
         |  FROM fr),
         |rels AS (
         |  SELECT doc_id % 5 AS query_id, doc_id AS d FROM documents
         |  WHERE $rel % 5 = 0),
         |nrel AS (
         |  SELECT query_id, count(*) AS n_rel FROM rels GROUP BY query_id),
         |hits AS (
         |  SELECT run.query_id, run.r FROM run
         |  JOIN rels ON run.query_id = rels.query_id AND run.d = rels.d
         |  WHERE run.r <= 10),
         |j AS (
         |  SELECT query_id, r,
         |    row_number() OVER (PARTITION BY query_id ORDER BY r) AS j
         |  FROM hits),
         |per AS (
         |  SELECT query_id, count(*) AS n_hits_at_k, min(r) AS first,
         |    sum((1000000 * j) // r) AS apnum
         |  FROM j GROUP BY query_id)
         |SELECT nrel.query_id, n_rel,
         |  CAST(coalesce(n_hits_at_k, 0) AS BIGINT) AS n_hits_at_k,
         |  CAST(coalesce(first, 0) AS BIGINT) AS first_rank,
         |  CAST(CASE WHEN first IS NULL THEN 0
         |       ELSE 1000000 // first END AS BIGINT) AS rr_ppm,
         |  CAST(coalesce(apnum, 0) // n_rel AS BIGINT) AS ap_ppm
         |FROM nrel LEFT JOIN per ON nrel.query_id = per.query_id""".stripMargin
    },
    // replays HashedClassifier over the deterministic pseudo-weight table:
    // slot = hash61(token) % 4096, weight = (hash61('w'||slot) % 2000001)
    // \u2212 1e6, score = bias + exact integer sum
    "t_quality_classifier" -> {
      s"""WITH wt AS (
         |  SELECT CAST(b AS BIGINT) AS bucket,
         |    (${hash61Sql("'w' || CAST(b AS VARCHAR)")} % 2000001) - 1000000
         |      AS wm
         |  FROM (SELECT unnest(range(0, 4096)) AS b)),
         |tok AS (
         |  SELECT doc_id, unnest(list_filter($WsSql, x -> x <> '')) AS t
         |  FROM documents),
         |sc AS (
         |  SELECT tok.doc_id, count(*) AS n_tokens,
         |    CAST(sum(wt.wm) AS BIGINT) AS sm
         |  FROM tok JOIN wt ON (${hash61Sql("t")} % 4096) = wt.bucket
         |  GROUP BY tok.doc_id)
         |SELECT d.doc_id,
         |  coalesce(sc.n_tokens, 0) AS n_tokens,
         |  CAST(coalesce(sc.sm, 0) - 50000 AS BIGINT) AS score_micro,
         |  (coalesce(sc.sm, 0) - 50000 >= 0) AS keep
         |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id""".stripMargin
    },
    // replays bigramFluency then the integer within-language third-slice:
    // bucket = ((rank\u22121)\u00B73) // n_lang over (fluency desc, id) ranks
    "t_ccnet_buckets" ->
      s"""WITH d AS (SELECT doc_id, $WsSql AS ws FROM documents),
         |bg AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, greatest(len(ws), 1)),
         |      i -> ws[i] || ' ' || ws[i+1])) AS bigram
         |  FROM d),
         |c2 AS (SELECT bigram, count(*) AS c2 FROM bg GROUP BY bigram),
         |c1 AS (SELECT split_part(bigram, ' ', 1) AS w1, count(*) AS c1
         |       FROM bg GROUP BY 1),
         |p AS (SELECT c2.bigram, (c2.c2 * 1000000) // c1.c1 AS micro
         |      FROM c2 JOIN c1 ON split_part(c2.bigram, ' ', 1) = c1.w1),
         |s AS (SELECT b.doc_id, count(*) AS n_bigrams,
         |        sum(p.micro) AS sum_micro
         |      FROM bg b JOIN p ON b.bigram = p.bigram
         |      GROUP BY b.doc_id),
         |f AS (SELECT doc_id, n_bigrams,
         |        CAST(sum_micro AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
         |          AS fluency
         |      FROM s),
         |j AS (SELECT f.doc_id, dd.lang, f.n_bigrams, f.fluency
         |      FROM f JOIN documents dd USING (doc_id)),
         |r AS (SELECT *,
         |        row_number() OVER (PARTITION BY lang
         |          ORDER BY fluency DESC, doc_id ASC) AS rk,
         |        count(*) OVER (PARTITION BY lang) AS n
         |      FROM j)
         |SELECT doc_id, lang, n_bigrams, fluency,
         |  CAST(((rk - 1) * 3) // n AS INT) AS bucket,
         |  CASE ((rk - 1) * 3) // n WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
         |    ELSE 'tail' END AS bucket_name
         |FROM r""".stripMargin,
    // ground-truth replay of the jsonl ingest: the oracle does not parse
    // JSON \u2014 it computes what a correct PERMISSIVE parser must produce
    // from the source fields (good line \u2192 fields + null raw; truncated
    // line \u2192 null fields + the raw 24-char prefix). The string build
    // replicates Spark's to_json byte-for-byte (no spaces, struct field
    // order, plain integers, unescaped short lang codes).
    "t_jsonl_ingest" ->
      s"""WITH j AS (
         |  SELECT doc_id, lang, n_chars,
         |    '{"id":' || doc_id || ',"lang":"' || lang || '","nc":' ||
         |      n_chars || '}' AS line,
         |    (${hash61Sql("CAST(doc_id AS VARCHAR)")} % 16 = 0) AS bad
         |  FROM documents)
         |SELECT doc_id,
         |  CASE WHEN bad THEN NULL ELSE doc_id END AS id,
         |  CASE WHEN bad THEN NULL ELSE lang END AS lang,
         |  CASE WHEN bad THEN NULL ELSE n_chars END AS nc,
         |  bad AS is_corrupt,
         |  CASE WHEN bad THEN substr(line, 1, 24) END AS raw
         |FROM j""".stripMargin,
    // replays t_format_roundtrip from the untouched parquet: if any of the
    // three write\u2192read paths corrupts a byte, a fingerprint sum diverges.
    // The adv expression mirrors the Spark-side adversarial column exactly
    // (quote + 40-char prefix + quote,comma,newline,backslash + lang).
    "t_format_roundtrip" -> {
      val advSql =
        """'"' || substr(text, 1, 40) || '",' || chr(10) || '\' || lang"""
      s"""WITH a AS (
         |  SELECT lang, count(*) AS n_docs,
         |    CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |    CAST(sum(doc_id) AS BIGINT) AS sum_id,
         |    CAST(sum(${hash61Sql("text")} % 1000000007) AS BIGINT)
         |      AS text_fp,
         |    CAST(sum(${hash61Sql(advSql)} % 1000000007) AS BIGINT)
         |      AS adv_fp,
         |    CAST(sum(${hash61Sql("source")} % 1000000007) AS BIGINT)
         |      AS source_fp
         |  FROM documents GROUP BY lang)
         |SELECT a.*, f.format
         |FROM a CROSS JOIN (VALUES ('orc'), ('csv'), ('json')) f(format)"""
        .stripMargin
    },
    // same replay shape as t_format_roundtrip, over the four codecs
    "t_codec_roundtrip" ->
      s"""WITH a AS (
         |  SELECT lang, count(*) AS n_docs,
         |    CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |    CAST(sum(${hash61Sql("text")} % 1000000007) AS BIGINT)
         |      AS text_fp
         |  FROM documents GROUP BY lang)
         |SELECT a.*, c.codec
         |FROM a CROSS JOIN (VALUES ('uncompressed'), ('snappy'), ('gzip'),
         |  ('zstd')) c(codec)""".stripMargin,
    // ONE chained replay: union + re-ingests \u2192 keep-min exact dedup \u2192
    // the pruned-lang aggregate (format legs are identity by contract)
    "p_ingest_e2e" ->
      s"""WITH all_docs AS (
         |  SELECT doc_id, lang, text, n_chars FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, lang, text, n_chars FROM documents
         |  WHERE doc_id % 2 = 1 AND doc_id % 10 = 1),
         |keep AS (
         |  SELECT min(doc_id) AS doc_id FROM all_docs GROUP BY md5(text)),
         |dedup AS (
         |  SELECT a.* FROM all_docs a JOIN keep k ON a.doc_id = k.doc_id)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |  CAST(sum(${hash61Sql("text")} % 1000000007) AS BIGINT) AS text_fp
         |FROM dedup WHERE ${hash61Sql("lang")} % 3 < 2
         |GROUP BY lang""".stripMargin,
    // the guaranteed heavy-hitter set with exact counts \u2014 integral
    // threshold compare (cnt\u00B733 > n), no division
    "t_heavy_hitters" ->
      s"""WITH w AS (
         |  SELECT unnest($WsSql) AS word FROM documents),
         |c AS (SELECT word, count(*) AS n_exact FROM w GROUP BY word),
         |t AS (SELECT CAST(sum(n_exact) AS BIGINT) AS n FROM c)
         |SELECT c.word, c.n_exact FROM c, t WHERE c.n_exact * 33 > t.n"""
        .stripMargin,
    // replays the union schema: nulls where generation 1 lacked the column
    "t_schema_evolution" ->
      """SELECT doc_id, lang,
        |  CASE WHEN doc_id % 2 = 0 THEN n_chars END AS n_chars,
        |  CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END AS gen
        |FROM documents""".stripMargin,
    // the exact ground truth the in-gate HLL bound was audited against
    "t_approx_distinct" ->
      """SELECT lang, count(DISTINCT text) AS n_exact
        |FROM documents GROUP BY lang""".stripMargin,
    // the pruned-read replay: same deterministic partition predicate
    "t_partitioned_layout" ->
      s"""SELECT lang, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |  CAST(sum(${hash61Sql("text")} % 1000000007) AS BIGINT) AS text_fp
         |FROM documents
         |WHERE ${hash61Sql("lang")} % 3 < 2
         |GROUP BY lang""".stripMargin,
    // replays corpusReport: exact integer aggregates + the portable
    // hash61 distinct-content count; mean = one double division
    "t_length_histogram" ->
      s"""WITH b AS (
         |  SELECT CAST(coalesce(len($WsSql), 0) AS BIGINT) AS toks
         |  FROM documents)
         |SELECT CAST(length(bin(toks)) AS INT) AS bucket,
         |  count(*) AS n_docs,
         |  CAST(sum(toks) AS BIGINT) AS total_tokens,
         |  min(toks) AS min_tokens, max(toks) AS max_tokens
         |FROM b GROUP BY 1""".stripMargin,
    "t_corpus_report" ->
      s"""WITH b AS (
         |  SELECT lang, source,
         |    coalesce(len($WsSql), 0) AS toks,
         |    coalesce(len(text), 0) AS chars,
         |    ${hash61Sql("coalesce(text, '')")} AS h
         |  FROM documents)
         |SELECT lang, source,
         |  count(*) AS n_docs,
         |  CAST(sum(toks) AS BIGINT) AS n_tokens,
         |  CAST(sum(chars) AS BIGINT) AS n_chars,
         |  count(DISTINCT h) AS n_distinct_texts,
         |  CAST(max(toks) AS BIGINT) AS max_tokens,
         |  CAST(sum(toks) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |    AS mean_tokens
         |FROM b GROUP BY lang, source""".stripMargin,
    // replays mixturePlan: per-lang token sums + the shared target CASE,
    // all-integer rational rate math (// is integer division; operands
    // non-negative so truncation = floor in both engines)
    "t_mixture_plan" -> {
      val shareCase = "CASE lang " + MixPlanTargets
        .map { case (k, v) => s"WHEN '$k' THEN $v" }
        .mkString(" ") + s" ELSE $MixPlanDefault END"
      s"""WITH b AS (
         |  SELECT lang, coalesce(len($WsSql), 0) AS toks FROM documents),
         |g AS (
         |  SELECT lang, CAST(sum(toks) AS BIGINT) AS tokens
         |  FROM b GROUP BY lang),
         |p AS (
         |  SELECT lang, tokens, CAST($shareCase AS BIGINT) AS share FROM g),
         |r AS (
         |  SELECT lang, tokens, share,
         |    least(
         |      CASE WHEN tokens = 0 THEN 0
         |        ELSE ((($MixPlanBudget * share) // 1000) * 1000) // tokens
         |        END,
         |      $MixPlanMax) AS rate
         |  FROM p)
         |SELECT lang, tokens, share AS target_per_mille,
         |  CAST(rate AS BIGINT) AS rate_per_mille,
         |  CAST((tokens * rate) // 1000 AS BIGINT) AS planned_tokens
         |FROM r""".stripMargin
    },
    // replays the mixture chain in one CTE pipeline: the P75 plan rates
    // (same CTEs as t_mixture_plan) drive the P23 copy explode (mix-salted
    // fractional copy), mixed ids = doc_id*1000+copy, then the P113
    // interleave order over the mixed corpus
    "t_mixture_e2e" -> {
      val shareCase = "CASE lang " + MixPlanTargets
        .map { case (k, v) => s"WHEN '$k' THEN $v" }
        .mkString(" ") + s" ELSE $MixPlanDefault END"
      val mixHash = hash61Sql("'mix:' || CAST(doc_id AS VARCHAR)")
      val ilHash = hash61Sql("'interleave:' || CAST(mixed_id AS VARCHAR)")
      s"""WITH b AS (
         |  SELECT lang, coalesce(len($WsSql), 0) AS toks FROM documents),
         |g AS (
         |  SELECT lang, CAST(sum(toks) AS BIGINT) AS tokens
         |  FROM b GROUP BY lang),
         |p AS (
         |  SELECT lang, tokens, CAST($shareCase AS BIGINT) AS share FROM g),
         |r AS (
         |  SELECT lang,
         |    least(
         |      CASE WHEN tokens = 0 THEN 0
         |        ELSE ((($MixPlanBudget * share) // 1000) * 1000) // tokens
         |        END,
         |      $MixPlanMax) AS rate
         |  FROM p),
         |m AS (
         |  SELECT d.doc_id, d.lang,
         |    (r.rate // 1000) +
         |      (CASE WHEN $mixHash % 1000 < r.rate % 1000 THEN 1 ELSE 0 END)
         |      AS n
         |  FROM documents d JOIN r USING (lang)),
         |mx AS (
         |  SELECT doc_id, lang,
         |    unnest(range(CAST(n AS BIGINT))) AS copy
         |  FROM m WHERE n > 0),
         |mi AS (
         |  SELECT doc_id * 1000 + copy AS mixed_id, doc_id, copy, lang
         |  FROM mx),
         |src AS (
         |  SELECT mixed_id, doc_id, copy, lang, $ilHash AS hk FROM mi),
         |pp AS (
         |  SELECT mixed_id, doc_id, copy, lang,
         |    row_number() OVER (PARTITION BY lang ORDER BY hk, mixed_id)
         |      AS ip,
         |    count(*) OVER (PARTITION BY lang) AS n
         |  FROM src)
         |SELECT mixed_id, doc_id, copy, lang,
         |  CAST(row_number() OVER (
         |    ORDER BY CAST(ip AS DOUBLE) / CAST(n AS DOUBLE), lang, ip)
         |    - 1 AS BIGINT) AS pos
         |FROM pp""".stripMargin
    },
    "t_gopher_repetition" ->
      s"""WITH m AS (
         |  SELECT doc_id, text,
         |    'shared boilerplate line' || chr(10) || 'unique content ' ||
         |      CAST(doc_id AS VARCHAR) || chr(10) ||
         |    CASE WHEN doc_id % 3 = 0 THEN 'shared boilerplate line'
         |         ELSE 'another unique ' || CAST(doc_id AS VARCHAR) END AS ml
         |  FROM documents),
         |a AS (
         |  SELECT doc_id, text, string_split(ml, chr(10)) AS lines,
         |    $WsSql AS ws
         |  FROM m),
         |b AS (
         |  SELECT doc_id, text, lines,
         |    list_transform(range(1, greatest(len(ws), 1)),
         |      i -> ws[i] || ' ' || ws[i+1]) AS bi,
         |    list_transform(range(1, greatest(len(ws) - 1, 1)),
         |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS tri
         |  FROM a),
         |lf AS (
         |  SELECT doc_id,
         |    CASE WHEN len(lines) > 0 THEN
         |      1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines)
         |    END AS dup_line_frac,
         |    CASE WHEN list_sum(list_transform(lines, l -> length(l))) > 0 THEN
         |      CAST(list_sum(list_transform(range(1, len(lines) + 1),
         |        i -> CASE WHEN len(list_filter(lines, x -> x = lines[i])) > 1
         |          THEN length(lines[i]) ELSE 0 END)) AS DOUBLE) /
         |      list_sum(list_transform(lines, l -> length(l)))
         |    END AS dup_line_char_frac
         |  FROM b),
         |bi_cnt AS (
         |  SELECT doc_id, g, count(*) AS c
         |  FROM b, unnest(bi) AS t(g) GROUP BY doc_id, g),
         |bi_top AS (
         |  SELECT doc_id, c, g FROM (
         |    SELECT doc_id, c, g, row_number() OVER (PARTITION BY doc_id
         |      ORDER BY c DESC, g DESC) AS rn
         |    FROM bi_cnt) WHERE rn = 1),
         |tri_cnt AS (
         |  SELECT doc_id, g, count(*) AS c
         |  FROM b, unnest(tri) AS t(g) GROUP BY doc_id, g),
         |tri_dup AS (
         |  SELECT doc_id,
         |    sum(CASE WHEN c > 1 THEN c * length(g) ELSE 0 END) AS dupchars
         |  FROM tri_cnt GROUP BY doc_id)
         |SELECT b.doc_id, lf.dup_line_frac, lf.dup_line_char_frac,
         |  CASE WHEN len(b.bi) > 0 AND length(b.text) > 0 THEN
         |    CAST(bi_top.c * length(bi_top.g) AS DOUBLE) / length(b.text)
         |  END AS top_bigram_char_frac,
         |  CASE WHEN len(b.tri) > 0 AND length(b.text) > 0 THEN
         |    CAST(tri_dup.dupchars AS DOUBLE) / length(b.text)
         |  END AS dup_trigram_char_frac
         |FROM b
         |LEFT JOIN lf ON b.doc_id = lf.doc_id
         |LEFT JOIN bi_top ON b.doc_id = bi_top.doc_id
         |LEFT JOIN tri_dup ON b.doc_id = tri_dup.doc_id""".stripMargin,
    "t_hash_split" -> {
      s"""SELECT doc_id,
         |  CASE WHEN ${hash61Sql("'split:' || CAST(doc_id AS VARCHAR)")} % 1000 < 980
         |    THEN 'train'
         |  WHEN ${hash61Sql("'split:' || CAST(doc_id AS VARCHAR)")} % 1000 < 990
         |    THEN 'validation'
         |  ELSE 'test' END AS split
         |FROM documents""".stripMargin
    },
    "t_corpus_mix" -> {
      val cases = MixWeights
        .map { case (k, r) => s"WHEN lang = '$k' THEN $r" }
        .mkString(" ")
      s"""WITH w AS (
         |  SELECT doc_id, lang,
         |    CASE $cases ELSE $MixDefault END AS wt,
         |    ${hash61Sql("'mix:' || CAST(doc_id AS VARCHAR)")} % 1000 AS b
         |  FROM documents)
         |SELECT doc_id, lang,
         |  unnest(range(CAST((wt // 1000) +
         |    (CASE WHEN b < wt % 1000 THEN 1 ELSE 0 END) AS BIGINT))) AS copy
         |FROM w""".stripMargin
    },
    // replays Dsir.selectTopK: bucketed bigram histograms, integer-scaled
    // smoothed target/raw ratio weights, per-doc sum, top-100 by
    // (score desc, doc_id) \u2014 `//` and Spark `div` agree on positive longs
    "t_dsir_select" -> {
      s"""WITH rg AS (
         |  SELECT doc_id, ${hash61Sql("g")} % 8192 AS bucket FROM (
         |    SELECT doc_id, unnest(${bigramsSql(WsSql)}) AS g
         |    FROM documents WHERE doc_id % 50 <> 0)),
         |tg AS (
         |  SELECT ${hash61Sql("g")} % 8192 AS bucket FROM (
         |    SELECT unnest(${bigramsSql(WsSql)}) AS g
         |    FROM documents WHERE doc_id % 50 = 0)),
         |rh AS (SELECT bucket, count(*) AS cr FROM rg GROUP BY bucket),
         |th AS (SELECT bucket, count(*) AS ct FROM tg GROUP BY bucket),
         |sc AS (
         |  SELECT rg.doc_id,
         |    count(*) AS n_grams,
         |    CAST(sum(((coalesce(th.ct, 0) + 1) * 1000000) // (rh.cr + 1))
         |      AS DOUBLE) / count(*) AS dsir_score
         |  FROM rg JOIN rh USING (bucket) LEFT JOIN th USING (bucket)
         |  GROUP BY rg.doc_id)
         |SELECT doc_id, n_grams, dsir_score FROM sc
         |ORDER BY dsir_score DESC, doc_id LIMIT 100""".stripMargin
    },
    "t_top_bigrams" -> {
      s"""SELECT bigram, count(*) AS n FROM (
         |  SELECT unnest(list_transform(range(1, greatest(len(ws), 1)),
         |    i -> ws[i] || ' ' || ws[i+1])) AS bigram
         |  FROM (SELECT $WsSql AS ws FROM documents)
         |) GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT 50""".stripMargin
    },
    "t_repetition" -> {
      def grams(n: Int) = {
        val parts = (0 until n)
          .map(j => if (j == 0) "ws[i]" else s"ws[i+$j]")
          .mkString(" || ' ' || ")
        s"list_transform(range(1, greatest(len(ws) - ${n - 2}, 1)), i -> $parts)"
      }
      def ratio(n: Int) =
        s"""CASE WHEN len(${grams(n)}) > 0 THEN
           |    1.0 - CAST(len(list_distinct(${grams(n)})) AS DOUBLE) /
           |      CAST(len(${grams(n)}) AS DOUBLE) END""".stripMargin
      s"""SELECT doc_id,
         |  ${ratio(2)} AS dup_bigram_ratio,
         |  ${ratio(3)} AS dup_trigram_ratio
         |FROM (SELECT doc_id, $WsSql AS ws FROM documents)""".stripMargin
    },
    "t_seq_pack" -> {
      s"""WITH d AS (
         |  SELECT lang, doc_id,
         |    ${hash61Sql("CAST(doc_id AS VARCHAR)")} % 4 AS shard,
         |    CAST(len($WsSql) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (
         |  SELECT lang, doc_id, shard, n_tokens,
         |    CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY lang, shard
         |      ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      - n_tokens, 0) AS BIGINT) AS cum
         |  FROM d)
         |SELECT lang, doc_id, shard, n_tokens,
         |  cum // 256 AS bin, cum % 256 AS bin_offset
         |FROM c""".stripMargin
    },
    "t_decontaminate" -> decontaminateSql(3),
    "t_decontaminate8" -> decontaminateSql(8),
    // transpose of t_decontaminate: per benchmark item, distinct leaking
    // corpus docs + distinct covered grams + coverage fraction
    "t_leak_report" -> {
      s"""WITH b AS (
         |  SELECT doc_id AS bid, unnest(${hashedShinglesSql(WsSql, 3)}) AS g
         |  FROM documents WHERE doc_id % 50 = 0),
         |bi AS (
         |  SELECT doc_id AS bid, len(${hashedShinglesSql(WsSql, 3)}) AS ni
         |  FROM documents WHERE doc_id % 50 = 0),
         |c AS (
         |  SELECT doc_id AS cid, unnest(${hashedShinglesSql(WsSql, 3)}) AS g
         |  FROM documents WHERE doc_id % 50 <> 0),
         |m AS (SELECT b.bid, c.cid, b.g FROM b JOIN c USING (g)),
         |a AS (
         |  SELECT bid, count(DISTINCT cid) AS n_leaked_docs,
         |    count(DISTINCT g) AS n_covered_ngrams
         |  FROM m GROUP BY bid)
         |SELECT a.bid AS doc_id, a.n_leaked_docs, a.n_covered_ngrams,
         |  CAST(bi.ni AS BIGINT) AS n_item_ngrams,
         |  CAST(a.n_covered_ngrams AS DOUBLE) / CAST(bi.ni AS BIGINT)
         |    AS leaked_frac
         |FROM a JOIN bi USING (bid)""".stripMargin
    },
    "t_quality_score" -> {
      val sw = TextFunctions.LangProfiles.head._2
        .map(s => s"'$s'").mkString("[", ", ", "]")
      s"""WITH b AS (
         |  SELECT doc_id, text, $WsSql AS ws FROM documents),
         |m AS (
         |  SELECT doc_id,
         |    least(length(text) / 400.0, 1.0) AS len_score,
         |    least((len(list_filter(ws, w -> list_contains($sw, w))) * 1.0
         |      / len(ws)) * 4.0, 1.0) AS sw_score,
         |    list_reduce(list_transform(ws, w -> CAST(length(w) AS BIGINT)),
         |      (acc, v) -> acc + v) * 1.0 / len(ws) AS mwl
         |  FROM b)
         |SELECT doc_id,
         |  len_score * 0.4 + sw_score * 0.3 +
         |    (CASE WHEN mwl >= 3.0 AND mwl <= 8.0 THEN 1.0 ELSE 0.5 END) * 0.3
         |    AS quality
         |FROM m""".stripMargin
    },
    "t_lang_id" -> {
      val hitExprs = TextFunctions.LangProfiles.map { case (lang, sw) =>
        val arr = sw.map(s => s"'$s'").mkString("[", ", ", "]")
        s"len(list_filter(ws, w -> list_contains($arr, w))) AS h_$lang"
      }
      val langs = TextFunctions.LangProfiles.map(_._1)
      val maxExpr = s"greatest(${langs.map("h_" + _).mkString(", ")})"
      val chain = langs
        .map(l => s"WHEN h_$l = mx AND mx > 0 THEN '$l'")
        .mkString(" ")
      s"""WITH b AS (
         |  SELECT lang, $WsSql AS ws FROM documents),
         |scored AS (
         |  SELECT lang, ${hitExprs.mkString(", ")} FROM b),
         |mxd AS (
         |  SELECT lang, *, $maxExpr AS mx FROM scored)
         |SELECT lang,
         |  CASE $chain ELSE 'und' END AS predicted,
         |  count(*) AS n_docs
         |FROM mxd GROUP BY 1, 2""".stripMargin
    },
    "s_ivf_assign" -> {
      def dotSql(x: String, y: String) =
        s"list_reduce(list_transform(range(1, len($x) + 1), " +
          s"i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)), (acc, v) -> acc + v)"
      // argmax over dot scores with first-index (= lowest centroid id) ties
      s"""WITH c AS (
         |  SELECT vec_id AS cid, embedding AS cv FROM embeddings
         |  WHERE vec_id < 4),
         |s AS (
         |  SELECT e.vec_id, c.cid, ${dotSql("e.embedding", "c.cv")} AS score
         |  FROM embeddings e CROSS JOIN c),
         |r AS (
         |  SELECT vec_id, cid,
         |    row_number() OVER (PARTITION BY vec_id
         |      ORDER BY score DESC, cid ASC) AS rn
         |  FROM s)
         |SELECT vec_id, CAST(cid AS INT) AS cell FROM r WHERE rn = 1""".stripMargin
    },
    // s_ivf_topk / s_pca_ann are ROWS+SCHEMA gates by design: k-means
    // training and PCA eigenvectors compose float sums that cannot
    // hash-match cross-engine (reassociation), but the pipeline SHAPE is
    // exactly replayable \u2014 every one of the 50 queries must surface
    // exactly k=5 ranked neighbors drawn from the corpus minus self, and
    // every vector must land in exactly one coarse cell. The oracles
    // reproduce that shape (row count + column names/types) so the driver's
    // rows_match/schema_match flip true; value columns carry 0 placeholders
    // (not NULL \u2014 an all-NULL int column decays to float64 in pandas and
    // would false-fail schema), so hash_match is expected FALSE and carries
    // no signal
    // (the value-level math is hash-gated separately: s_ivf_assign,
    // s_cosine_topk; recall floors + subspace recovery live in the specs).
    "s_ivf_topk" ->
      """SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rank,
        |  CAST(0 AS DOUBLE) AS cos_sim
        |FROM (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.vec_id ORDER BY n.vec_id) AS rnk
        |  FROM (SELECT vec_id FROM embeddings WHERE vec_id < 50) q
        |  JOIN embeddings n ON n.vec_id <> q.vec_id)
        |WHERE rnk <= 5""".stripMargin,
    "s_pca_ann" ->
      "SELECT vec_id, CAST(0 AS INT) AS cell FROM embeddings",
    "s_cosine_topk" -> {
      def dotSql(x: String, y: String) =
        s"list_reduce(list_transform(range(1, len($x) + 1), " +
          s"i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)), (acc, v) -> acc + v)"
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
         |  WHERE vec_id < 100),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
         |s AS (
         |  SELECT query_id, neighbor_id,
         |    ${dotSql("qv", "cv")} /
         |      (sqrt(${dotSql("qv", "qv")}) * sqrt(${dotSql("cv", "cv")})) AS cos
         |  FROM c, q WHERE query_id <> neighbor_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM s)
         |SELECT query_id, neighbor_id, rank, cos AS cos_sim
         |FROM ranked WHERE rank <= 5""".stripMargin
    },
    // s_cosine_topk with the label-mismatch predicate \u2014 identical cosine
    // arithmetic (same fold order), so raw doubles hash-match
    "s_hard_negatives" -> {
      def dotSql(x: String, y: String) =
        s"list_reduce(list_transform(range(1, len($x) + 1), " +
          s"i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)), (acc, v) -> acc + v)"
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, label AS ql, embedding AS qv
         |  FROM embeddings WHERE vec_id < 100),
         |c AS (
         |  SELECT vec_id AS neighbor_id, label AS cl, embedding AS cv
         |  FROM embeddings),
         |s AS (
         |  SELECT query_id, neighbor_id,
         |    ${dotSql("qv", "cv")} /
         |      (sqrt(${dotSql("qv", "qv")}) * sqrt(${dotSql("cv", "cv")})) AS cos
         |  FROM c, q WHERE query_id <> neighbor_id AND ql <> cl),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM s)
         |SELECT query_id, neighbor_id, rank, cos AS cos_sim
         |FROM ranked WHERE rank <= 5""".stripMargin
    },
    // replays the ORDERED per-dimension fold: list(\u2026 ORDER BY vec_id) then
    // left-to-right list_reduce \u2014 the same association order as the Spark
    // sort_array + aggregate, so raw doubles hash-match. Unnested to one
    // scalar row per dimension (zipped unnests) to mirror the gate's
    // posexplode \u2014 the harness cannot sort array-typed columns.
    "s_mean_pool" -> {
      s"""WITH g AS (
         |  SELECT vec_id % 100 AS g_id, list(embedding ORDER BY vec_id) AS vs
         |  FROM embeddings GROUP BY vec_id % 100),
         |m AS (
         |  SELECT g_id, len(vs) AS n_members,
         |    list_transform(range(1, len(vs[1]) + 1),
         |      d -> list_reduce(list_transform(vs, v -> CAST(v[d] AS DOUBLE)),
         |        (a, b) -> a + b) / len(vs)) AS pooled
         |  FROM g)
         |SELECT g_id, n_members,
         |  CAST(unnest(range(0, len(pooled))) AS INT) AS dim,
         |  unnest(pooled) AS value
         |FROM m""".stripMargin
    },
    "s_embed_neardup" -> {
      s"""WITH $embedNearDupCte
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  ${embDotSql("a.embedding", "b.embedding")} / (a.n * b.n) AS cos_sim
         |FROM emb_lsh a JOIN emb_lsh b
         |  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE ${embDotSql("a.embedding", "b.embedding")} / (a.n * b.n) >= 0.45""".stripMargin
    },
    "s_semantic_dedup" -> {
      // pairs (same bucket-blocked cosine as s_embed_neardup) \u2192 transitive
      // closure (as p_dup_clusters) \u2192 drop non-representatives \u2192 survivors
      s"""WITH RECURSIVE $embedNearDupCte,
         |p AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM emb_lsh a JOIN emb_lsh b
         |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |  WHERE ${embDotSql("a.embedding", "b.embedding")} / (a.n * b.n) >= 0.45),
         |edges AS (
         |  SELECT id_a AS n, id_b AS m FROM p
         |  UNION ALL
         |  SELECT id_b AS n, id_a AS m FROM p),
         |reach(n, m) AS (
         |  SELECT n, m FROM edges
         |  UNION
         |  SELECT e.n, r.m FROM edges e JOIN reach r ON e.m = r.n),
         |lbl AS (SELECT n, least(n, min(m)) AS c FROM reach GROUP BY n)
         |SELECT emb.vec_id, emb.label FROM embeddings emb
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM lbl WHERE lbl.n = emb.vec_id AND lbl.n <> lbl.c)""".stripMargin
    },
    "t_quota_sample" -> {
      s"""SELECT doc_id, lang FROM (
         |  SELECT doc_id, lang,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY ${hash61Sql("'quota:' || CAST(doc_id AS VARCHAR)")},
         |        doc_id) AS rn
         |  FROM documents) WHERE rn <= 20""".stripMargin
    },
    "t_rank_normalize" ->
      s"""WITH b AS (
         |  SELECT doc_id, lang, CAST(len($WsSql) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY lang),
         |r AS (
         |  SELECT b.doc_id, b.lang, b.n_tokens,
         |    CAST(row_number() OVER (PARTITION BY b.lang
         |      ORDER BY b.n_tokens, b.doc_id) - 1 AS BIGINT) AS rk,
         |    c.n
         |  FROM b JOIN c ON b.lang = c.lang)
         |SELECT doc_id, lang, n_tokens,
         |  (rk * 1000000) // greatest(n - 1, 1) AS rank_ppm
         |FROM r""".stripMargin,
    "t_corpus_drift" ->
      s"""WITH ea AS (
         |  SELECT unnest($WsSql) AS token FROM documents
         |  WHERE doc_id % 2 = 0),
         |eb AS (
         |  SELECT unnest($WsSql) AS token FROM documents
         |  WHERE doc_id % 2 = 1),
         |ha AS (SELECT token, CAST(count(*) AS BIGINT) AS count_a
         |       FROM ea WHERE token <> '' GROUP BY 1),
         |hb AS (SELECT token, CAST(count(*) AS BIGINT) AS count_b
         |       FROM eb WHERE token <> '' GROUP BY 1),
         |ta AS (SELECT CAST(sum(count_a) AS BIGINT) AS t FROM ha),
         |tb AS (SELECT CAST(sum(count_b) AS BIGINT) AS t FROM hb),
         |j AS (
         |  SELECT coalesce(ha.token, hb.token) AS token,
         |    coalesce(count_a, 0) AS count_a,
         |    coalesce(count_b, 0) AS count_b,
         |    (coalesce(count_a, 0) * 1000000) // (SELECT t FROM ta)
         |      AS ppm_a,
         |    (coalesce(count_b, 0) * 1000000) // (SELECT t FROM tb)
         |      AS ppm_b
         |  FROM ha FULL OUTER JOIN hb ON ha.token = hb.token)
         |SELECT token, count_a, count_b, ppm_a, ppm_b,
         |  abs(ppm_a - ppm_b) AS delta_ppm
         |FROM j
         |ORDER BY delta_ppm DESC, token ASC LIMIT 100""".stripMargin,
    "t_scripts" -> {
      // ppm columns + dominant CASE generated from the SAME ScriptClasses
      // constants as the Spark side
      val ppmCols = TextFunctions.ScriptClasses
        .map { case (n, body) =>
          s"""CASE WHEN length(txt) = 0 THEN CAST(0 AS BIGINT)
             |      ELSE ((length(txt) - length(regexp_replace(txt,
             |        '[$body]', '', 'g'))) * 1000000) // length(txt)
             |      END AS ${n}_ppm""".stripMargin
        }
        .mkString(",\n    ")
      val names = TextFunctions.ScriptClasses.map(_._1)
      val maxExpr = s"greatest(${names.map(n => s"${n}_ppm").mkString(", ")})"
      val domCase = names
        .map(n => s"WHEN ${n}_ppm = $maxExpr AND $maxExpr > 0 THEN '$n'")
        .mkString("\n    ")
      s"""WITH j AS (
         |  SELECT doc_id, text
         |    || CASE WHEN doc_id % 3 = 0
         |         THEN ${chrsOf(ScriptFixtureCjk)} ELSE '' END
         |    || CASE WHEN doc_id % 4 = 0
         |         THEN ${chrsOf(ScriptFixtureCyr)} ELSE '' END
         |    || CASE WHEN doc_id % 6 = 0
         |         THEN ${chrsOf(ScriptFixtureArab)} ELSE '' END AS txt
         |  FROM documents),
         |c AS (
         |  SELECT doc_id,
         |    $ppmCols
         |  FROM j)
         |SELECT doc_id, ${names.map(n => s"${n}_ppm").mkString(", ")},
         |  CASE $domCase
         |    ELSE 'none' END AS dominant
         |FROM c""".stripMargin
    },
    "t_mojibake" -> {
      // chr()-code injection + counts GENERATED from the same
      // TextFunctions.MojibakeSeqs constants as the Spark side
      def chrs(s: String) = s.map(c => s"chr(${c.toInt})").mkString(" || ")
      val mojiSum = TextFunctions.MojibakeSeqs
        .map(s =>
          s"(length(txt) - length(replace(txt, ${chrs(s)}, ''))) // ${s.length}")
        .mkString("\n      + ")
      s"""WITH j AS (
         |  SELECT doc_id, text
         |    || CASE WHEN doc_id % 5 = 0
         |         THEN chr(195)||chr(169)||chr(195)||chr(168) ELSE '' END
         |    || CASE WHEN doc_id % 7 = 0 THEN chr(65533) ELSE '' END
         |    || CASE WHEN doc_id % 11 = 0
         |         THEN chr(133)||chr(146) ELSE '' END
         |    || CASE WHEN doc_id % 13 = 0
         |         THEN chr(226)||chr(8364)||chr(8482) ELSE '' END AS txt
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, CAST(length(txt) AS BIGINT) AS L,
         |    CAST(length(txt) - length(replace(txt, chr(65533), ''))
         |      AS BIGINT) AS n_replacement,
         |    CAST(length(txt) - length(regexp_replace(txt,
         |      '[\\x{0080}-\\x{009F}]', '', 'g')) AS BIGINT) AS n_c1,
         |    CAST($mojiSum AS BIGINT) AS n_moji
         |  FROM j)
         |SELECT doc_id, n_replacement, n_c1, n_moji,
         |  CASE WHEN L = 0 THEN CAST(0 AS BIGINT)
         |    ELSE ((n_replacement + n_c1 + n_moji) * 1000000) // L END
         |    AS artifact_ppm,
         |  (n_replacement + n_c1 + n_moji) = 0 AS clean
         |FROM c""".stripMargin
    },
    // the identical translate replayed from the SHARED from/to constants
    // (trailing from-chars past the to-string's end delete \u2014 the
    // zero-width strip; same contract both engines)
    "t_confusables" -> {
      val from = graft.ops.TextFunctions.ConfusableFrom
      val to = graft.ops.TextFunctions.ConfusableTo
      s"""WITH twins AS (
         |  SELECT doc_id + 10000000 AS doc_id,
         |    translate(text, 'aeopcyx',
         |      '\u0430\u0435\u043E\u0440\u0441\u0443\u0445')
         |      || '\u200B' AS text
         |  FROM documents WHERE doc_id % 37 = 0),
         |corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id, text FROM twins),
         |skel AS (
         |  SELECT doc_id,
         |    ${hash61Sql("text")} % 1000000007 AS raw_fp,
         |    ${hash61Sql(s"translate(text, '$from', '$to')")}
         |      % 1000000007 AS skel_fp
         |  FROM corpus),
         |ns AS (SELECT skel_fp, count(*) AS n FROM skel GROUP BY skel_fp),
         |nr AS (SELECT raw_fp, count(*) AS n FROM skel GROUP BY raw_fp)
         |SELECT s.doc_id,
         |  CAST(ns.n - 1 AS BIGINT) AS skel_dups,
         |  CAST(nr.n - 1 AS BIGINT) AS raw_dups
         |FROM skel s
         |JOIN ns USING (skel_fp)
         |JOIN nr USING (raw_fp)""".stripMargin
    },
    // the dirty slice + all five constraint families replayed relationally
    "t_data_quality" ->
      """WITH dirty AS (
        |  SELECT o_orderkey, o_custkey + 1000000 AS o_custkey,
        |    'X' AS o_orderstatus, -o_totalprice AS o_totalprice,
        |    CAST(NULL AS TIMESTAMP) AS o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 101 = 0),
        |a AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |    o_orderdate, o_orderpriority FROM orders
        |  UNION ALL SELECT * FROM dirty),
        |p AS (
        |  SELECT 'totalprice_positive' AS check_name,
        |    CAST(sum(CASE WHEN coalesce(o_totalprice > 0, false)
        |      THEN 0 ELSE 1 END) AS BIGINT) AS n_violations,
        |    count(*) AS n_rows FROM a
        |  UNION ALL
        |  SELECT 'status_in_domain',
        |    CAST(sum(CASE WHEN o_orderstatus IN ('O', 'F', 'P')
        |      THEN 0 ELSE 1 END) AS BIGINT), count(*) FROM a
        |  UNION ALL
        |  SELECT 'orderdate_not_null',
        |    CAST(sum(CASE WHEN o_orderdate IS NOT NULL
        |      THEN 0 ELSE 1 END) AS BIGINT), count(*) FROM a
        |  UNION ALL
        |  SELECT 'orderkey_unique',
        |    CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS BIGINT),
        |    CAST(sum(c) AS BIGINT)
        |  FROM (SELECT count(*) AS c FROM a GROUP BY o_orderkey)
        |  UNION ALL
        |  SELECT 'custkey_fk',
        |    CAST((SELECT count(*) FROM a x WHERE NOT EXISTS (
        |      SELECT 1 FROM customer c WHERE c.c_custkey = x.o_custkey))
        |      AS BIGINT),
        |    count(*) FROM a)
        |SELECT check_name, n_violations, n_rows,
        |  CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS pass
        |FROM p""".stripMargin,
    "t_systematic_sample" ->
      s"""WITH b AS (
         |  SELECT doc_id, CAST(len($WsSql) AS BIGINT) AS w,
         |    ${hash61Sql("'pps:' || CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents
         |  WHERE len($WsSql) > 0),
         |t AS (SELECT CAST(sum(w) AS BIGINT) AS tot FROM b),
         |c AS (
         |  SELECT doc_id, w,
         |    CAST(sum(w) OVER (ORDER BY h, doc_id) AS BIGINT) AS cum
         |  FROM b)
         |SELECT doc_id,
         |  (cum * 100) // tot - ((cum - w) * 100) // tot AS n_hits
         |FROM c, t
         |WHERE (cum * 100) // tot - ((cum - w) * 100) // tot > 0""".stripMargin,
    "t_chunk_docs" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, len(w) AS L,
        |    CASE WHEN len(w) <= 50 THEN 1
        |         ELSE CAST(ceil((len(w) - 50) / 40.0) AS BIGINT) + 1 END AS nc,
        |    w
        |  FROM d),
        |x AS (SELECT doc_id, L, w, unnest(range(0, nc)) AS i FROM c)
        |SELECT doc_id, CAST(i AS INT) AS chunk_idx,
        |  array_to_string(list_slice(w, i*40 + 1, i*40 + 50), ' ') AS chunk_text,
        |  CAST(least(50, L - i*40) AS INT) AS n_words
        |FROM x""".stripMargin,
    "p_segment_dedup" -> segmentDedupOracle,
    // same oracle: the skew-safe two-phase plan is result-identical
    "p_segment_dedup_skewsafe" -> segmentDedupOracle,
    // frequency-thresholded boilerplate: drop ALL occurrences of windows
    // appearing in >= 2 distinct docs (vs keep-first above)
    "p_segment_boilerplate" ->
      s"""WITH $SegmentWindowCtes,
         |hot AS (
         |  SELECT h FROM (
         |    SELECT ${hash61Sql("seg")} AS h, count(DISTINCT doc_id) AS df
         |    FROM s GROUP BY 1) WHERE df >= 2),
         |k AS (
         |  SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS clean_text,
         |    count(*) AS n_kept
         |  FROM s WHERE ${hash61Sql("seg")} NOT IN (SELECT h FROM hot)
         |  GROUP BY doc_id)
         |SELECT c.doc_id, coalesce(k.clean_text, '') AS clean_text,
         |  coalesce(k.n_kept, 0) AS n_kept,
         |  c.nc - coalesce(k.n_kept, 0) AS n_dropped
         |FROM c LEFT JOIN k ON c.doc_id = k.doc_id""".stripMargin,
    // per-source boilerplate: the same chain with the df histogram keyed
    // by (source, segment hash) and a NOT EXISTS anti-join
    "p_source_boilerplate" ->
      s"""WITH $SegmentWindowCtes,
         |sg AS (
         |  SELECT s.doc_id, s.pos, s.seg, d2.source,
         |    ${hash61Sql("s.seg")} AS h
         |  FROM s JOIN documents d2 ON s.doc_id = d2.doc_id),
         |hot AS (
         |  SELECT source, h FROM (
         |    SELECT source, h, count(DISTINCT doc_id) AS df
         |    FROM sg GROUP BY 1, 2) WHERE df >= 2),
         |k AS (
         |  SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS clean_text,
         |    count(*) AS n_kept
         |  FROM sg WHERE NOT EXISTS (
         |    SELECT 1 FROM hot
         |    WHERE hot.source = sg.source AND hot.h = sg.h)
         |  GROUP BY doc_id)
         |SELECT c.doc_id, coalesce(k.clean_text, '') AS clean_text,
         |  coalesce(k.n_kept, 0) AS n_kept,
         |  c.nc - coalesce(k.n_kept, 0) AS n_dropped
         |FROM c LEFT JOIN k ON c.doc_id = k.doc_id""".stripMargin,
    // sentence-granularity boilerplate: the P89 splitter feeding the P46
    // df-histogram + NOT IN + in-order rejoin chain
    "p_sentence_boilerplate" -> {
      val fixture =
        "'Subscribe to our newsletter. ' || text || " +
          "'. All rights reserved. Cookie policy applies.'"
      s"""WITH f AS (SELECT doc_id, $fixture AS t FROM documents),
         |sl AS (
         |  SELECT doc_id,
         |    list_filter(list_transform(
         |      string_split(regexp_replace(trim(t),
         |        '([.!?]["'')\\]]?)\\s+', '\\1' || chr(31), 'g'), chr(31)),
         |      x -> trim(x)), x -> x <> '') AS ss
         |  FROM f),
         |s AS (
         |  SELECT doc_id, unnest(ss) AS seg,
         |    CAST(unnest(range(1, len(ss) + 1)) AS INT) AS pos
         |  FROM sl),
         |c AS (SELECT doc_id, len(ss) AS nc FROM sl),
         |hot AS (
         |  SELECT h FROM (
         |    SELECT ${hash61Sql("seg")} AS h, count(DISTINCT doc_id) AS df
         |    FROM s GROUP BY 1) WHERE df >= 2),
         |k AS (
         |  SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS clean_text,
         |    count(*) AS n_kept
         |  FROM s WHERE ${hash61Sql("seg")} NOT IN (SELECT h FROM hot)
         |  GROUP BY doc_id)
         |SELECT c.doc_id, coalesce(k.clean_text, '') AS clean_text,
         |  coalesce(k.n_kept, 0) AS n_kept,
         |  c.nc - coalesce(k.n_kept, 0) AS n_dropped
         |FROM c LEFT JOIN k ON c.doc_id = k.doc_id""".stripMargin
    },
    // maximal duplicated spans (Lee et al. exact substring dedup, 20-word
    // windows, >= 2 distinct docs)
    "p_dup_spans" ->
      s"""WITH ${dupSpansCtes(20, 2)}
         |SELECT doc_id, span_start, span_end, n_windows FROM spans""".stripMargin,
    // identical oracle: the exact-collapse plan is result-identical
    "p_dup_spans_fast" ->
      s"""WITH ${dupSpansCtes(20, 2)}
         |SELECT doc_id, span_start, span_end, n_windows FROM spans""".stripMargin,
    // span removal: every doc rebuilt from words not covered by any span
    "p_span_removed" ->
      s"""WITH ${dupSpansCtes(20, 2)},
         |cov AS (
         |  SELECT DISTINCT doc_id, j
         |  FROM spans, unnest(range(span_start, span_end + 1)) AS t(j)),
         |tok AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS i, ws[i] AS wd
         |  FROM w, unnest(range(1, len(ws) + 1)) AS t(i)),
         |keep AS (
         |  SELECT tok.doc_id, tok.i, tok.wd
         |  FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.i = cov.j
         |  WHERE cov.j IS NULL),
         |agg AS (
         |  SELECT doc_id, string_agg(wd, ' ' ORDER BY i) AS clean_text,
         |    count(*) AS n_kept
         |  FROM keep GROUP BY doc_id)
         |SELECT w.doc_id, coalesce(agg.clean_text, '') AS clean_text,
         |  CAST(coalesce(agg.n_kept, 0) AS BIGINT) AS n_kept,
         |  CAST(len(w.ws) - coalesce(agg.n_kept, 0) AS BIGINT) AS n_dropped
         |FROM w LEFT JOIN agg USING (doc_id)""".stripMargin,
    // intra-doc variant: first occurrence per (doc, segment) instead of
    // per segment corpus-wide
    "p_segment_dedup_doc" ->
      s"""WITH d AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, CAST(ceil(len(w) / 10.0) AS BIGINT) AS nc, w FROM d),
         |x AS (SELECT doc_id, w, unnest(range(0, nc)) AS i FROM c),
         |s AS (
         |  SELECT doc_id, i AS pos,
         |    array_to_string(list_slice(w, i*10 + 1, i*10 + 10), ' ') AS seg
         |  FROM x),
         |r AS (
         |  SELECT doc_id, pos, seg,
         |    row_number() OVER (PARTITION BY doc_id, seg ORDER BY pos) AS rn
         |  FROM s),
         |k AS (
         |  SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS clean_text,
         |    count(*) AS n_kept
         |  FROM r WHERE rn = 1 GROUP BY doc_id)
         |SELECT c.doc_id, coalesce(k.clean_text, '') AS clean_text,
         |  CAST(coalesce(k.n_kept, 0) AS INT) AS n_kept,
         |  CAST(c.nc - coalesce(k.n_kept, 0) AS INT) AS n_dropped
         |FROM c LEFT JOIN k ON c.doc_id = k.doc_id""".stripMargin,
    "p_cross_dedup" ->
      """SELECT d.doc_id, d.lang, d.source FROM documents d
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM documents s
        |  WHERE s.doc_id % 50 = 0 AND md5(s.text) = md5(d.text))""".stripMargin,
    "t_quantiles" ->
      """WITH a AS (
        |  SELECT quantile_disc(n_chars, [0.25, 0.5, 0.75, 0.875, 1.0]) AS vs
        |  FROM documents)
        |SELECT
        |  CAST(unnest([0.25, 0.5, 0.75, 0.875, 1.0]) AS DOUBLE) AS q,
        |  unnest(vs) AS value
        |FROM a""".stripMargin,
    // the exact ground truth the in-gate GK-sketch band audit ran against
    "t_approx_quantiles" ->
      """WITH a AS (
        |  SELECT quantile_disc(n_chars, [0.125, 0.5, 0.9375]) AS vs
        |  FROM documents)
        |SELECT
        |  CAST(unnest([0.125, 0.5, 0.9375]) AS DOUBLE) AS q,
        |  unnest(vs) AS value
        |FROM a""".stripMargin,
    "t_group_quantiles" ->
      """WITH a AS (
        |  SELECT lang, quantile_disc(n_chars, [0.25, 0.5, 0.875]) AS vs
        |  FROM documents GROUP BY lang)
        |SELECT lang,
        |  CAST(unnest([0.25, 0.5, 0.875]) AS DOUBLE) AS q,
        |  unnest(vs) AS value
        |FROM a""".stripMargin,
    "t_winsorize" ->
      """WITH b AS (
        |  SELECT lang, quantile_disc(n_chars, 0.125) AS lo,
        |    quantile_disc(n_chars, 0.875) AS hi
        |  FROM documents GROUP BY lang)
        |SELECT d.doc_id, d.lang, d.n_chars,
        |  least(greatest(d.n_chars, b.lo), b.hi) AS clipped
        |FROM documents d JOIN b ON d.lang = b.lang""".stripMargin,
    "p_curation_e2e" ->
      s"""WITH corpus AS (
         |  SELECT * FROM documents WHERE doc_id % 50 <> 0),
         |bench AS (
         |  SELECT DISTINCT g FROM (
         |    SELECT unnest(${hashedShinglesSql(WsSql, 3)}) AS g
         |    FROM documents WHERE doc_id % 50 = 0)),
         |quality AS (
         |  SELECT * FROM corpus WHERE len($WsSql) >= 20),
         |dedup AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |    FROM quality) WHERE rn = 1),
         |contaminated AS (
         |  SELECT DISTINCT d.doc_id FROM (
         |    SELECT doc_id, unnest(${hashedShinglesSql(WsSql, 3)}) AS g
         |    FROM dedup) d JOIN bench USING (g)),
         |clean AS (
         |  SELECT * FROM dedup
         |  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
         |cum AS (
         |  SELECT doc_id, n_chars,
         |    sum(len($WsSql)) OVER (ORDER BY n_chars DESC, doc_id) AS cum
         |  FROM clean)
         |SELECT doc_id, n_chars, CAST(cum AS BIGINT) AS cum_tokens
         |FROM cum WHERE cum <= 8000""".stripMargin,
    "t_token_budget" ->
      s"""WITH c AS (
         |  SELECT doc_id, n_chars,
         |    sum(len($WsSql)) OVER (
         |      ORDER BY n_chars DESC, doc_id) AS cum
         |  FROM documents)
         |SELECT doc_id, n_chars, CAST(cum AS BIGINT) AS cum_tokens
         |FROM c WHERE cum <= 15000""".stripMargin,
    // per-group twin: window cumsum PARTITIONED by lang, CASE budget map
    "t_group_budget" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang, n_chars, len($WsSql) AS ntok,
         |    CASE lang WHEN 'en' THEN 8000 WHEN 'de' THEN 4000
         |      WHEN 'zh' THEN 2000 END AS b
         |  FROM documents WHERE lang IN ('en', 'de', 'zh')),
         |c AS (
         |  SELECT doc_id, lang, n_chars, b,
         |    sum(ntok) OVER (PARTITION BY lang
         |      ORDER BY n_chars DESC, doc_id) AS cum
         |  FROM d)
         |SELECT doc_id, lang, n_chars, CAST(cum AS BIGINT) AS cum_tokens
         |FROM c WHERE cum <= b""".stripMargin,
    "p_cross_neardup" ->
      s"""WITH ${minhashCrossCtes("doc_id % 2 = 0", "doc_id % 2 = 1")}
         |SELECT d.doc_id, d.lang, d.source FROM documents d
         |WHERE d.doc_id % 2 = 0 AND NOT EXISTS (
         |  SELECT 1 FROM verified v
         |  WHERE v.id_a = d.doc_id AND v.i * 1.0 / v.u >= 0.5)""".stripMargin,
    "p_bloom_antijoin" ->
      """SELECT o_orderkey, o_custkey FROM orders o
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM customer c
        |  WHERE c.c_acctbal < 0 AND c.c_custkey = o.o_custkey)""".stripMargin,
    "m_frame_sample" ->
      """SELECT doc_id,
        |  CAST(unnest(range(0, 1 + doc_id % 6, 2)) AS INT) AS frame_idx
        |FROM documents""".stripMargin,
    "m_media_meta" ->
      """SELECT doc_id,
        |  CAST(8 + doc_id % 5 AS INT) AS width,
        |  CAST(8 + doc_id % 3 AS INT) AS height,
        |  CAST(1 AS INT) AS n_frames,
        |  'png' AS format
        |FROM documents""".stripMargin,
    "m_image_stats" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    8 + doc_id % 5 AS w, 8 + doc_id % 3 AS h,
        |    (doc_id * 7) % 256 AS r0,
        |    (doc_id * 11) % 256 AS g0,
        |    (doc_id * 13) % 256 AS b0
        |  FROM documents)
        |SELECT doc_id, 'png' AS format,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(w * h AS BIGINT) AS n_pixels,
        |  CAST(h * (w*r0 + (w*(w-1))//2 - 256*GREATEST(0, r0+w-256))
        |    AS BIGINT) AS sum_r,
        |  CAST(w * (h*g0 + (h*(h-1))//2 - 256*GREATEST(0, g0+h-256))
        |    AS BIGINT) AS sum_g,
        |  CAST(w * h * b0 AS BIGINT) AS sum_b
        |FROM g""".stripMargin,
    // per-sample sawtooth replay: sample i = ((i·k + 7) mod 65536) − 32768
    "m_audio_stats" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    256 + (doc_id % 17) * 32 AS n,
        |    1 + doc_id % 9973 AS k
        |  FROM documents),
        |sm AS (
        |  SELECT doc_id, n,
        |    abs(((CAST(unnest(range(0, n)) AS BIGINT) * k + 7) % 65536)
        |      - 32768) AS a
        |  FROM p)
        |SELECT doc_id, 'wav' AS format,
        |  CAST(8000 AS INT) AS sample_rate,
        |  CAST(1 AS INT) AS channels,
        |  CAST(16 AS INT) AS bits,
        |  CAST(max(n) AS BIGINT) AS n_samples,
        |  CAST(sum(a) AS BIGINT) AS sum_abs,
        |  CAST(max(a) AS INT) AS max_amp
        |FROM sm GROUP BY doc_id""".stripMargin,
    // box-walk replay: every field is a closed form of the generator's
    // doc_id-derived parameters; duration is the mvhd integer division
    "m_video_meta" ->
      """SELECT doc_id, 'mp4' AS format, 'isom' AS major_brand,
        |  CAST(((1000 + doc_id % 50000) * 1000)
        |    // (600 + (doc_id % 5) * 200) AS BIGINT) AS duration_ms,
        |  CAST(1 + doc_id % 3 AS INT) AS n_tracks,
        |  CAST(160 + (doc_id % 8) * 40 AS INT) AS width,
        |  CAST(120 + (doc_id % 6) * 30 AS INT) AS height,
        |  CASE WHEN doc_id % 4 = 0 THEN 'avc1'
        |       WHEN doc_id % 4 = 1 THEN 'hvc1'
        |       WHEN doc_id % 4 = 2 THEN 'vp09'
        |       ELSE 'av01' END AS codec
        |FROM documents""".stripMargin,
    // EBML walk replay: duration = units x ns-per-unit // 1e6, every
    // other field a closed form of the generator's doc_id parameters
    "m_webm_meta" ->
      """SELECT doc_id, 'webm' AS format, 'webm' AS major_brand,
        |  CAST(((1000 + doc_id % 50000) *
        |    CASE WHEN doc_id % 5 = 0 THEN 250000
        |         WHEN doc_id % 5 = 1 THEN 500000
        |         WHEN doc_id % 5 = 2 THEN 1000000
        |         WHEN doc_id % 5 = 3 THEN 2000000
        |         ELSE 4000000 END) // 1000000 AS BIGINT) AS duration_ms,
        |  CAST(1 + doc_id % 3 AS INT) AS n_tracks,
        |  CAST(160 + (doc_id % 8) * 40 AS INT) AS width,
        |  CAST(120 + (doc_id % 6) * 30 AS INT) AS height,
        |  CASE WHEN doc_id % 3 = 0 THEN 'V_VP8'
        |       WHEN doc_id % 3 = 1 THEN 'V_VP9'
        |       ELSE 'V_AV1' END AS codec
        |FROM documents""".stripMargin,
    // WARC replay: warcinfo row + one row per response record, every
    // field a closed form of (doc_id, rec_idx); gzip must be transparent
    "u_warc_ingest" ->
      """WITH r AS (
        |  SELECT doc_id,
        |    CAST(unnest(range(0, 1 + doc_id % 3)) AS INT) AS rr
        |  FROM documents)
        |SELECT doc_id, CAST(0 AS INT) AS rec_idx,
        |  'warcinfo' AS warc_type, '' AS target_uri,
        |  CAST(0 AS INT) AS http_status, '' AS content_type,
        |  CAST(25 AS INT) AS payload_len,
        |  'software: graft-fixture' || chr(13) || chr(10) AS payload
        |FROM documents
        |UNION ALL
        |SELECT doc_id, rr + 1 AS rec_idx,
        |  'response' AS warc_type,
        |  'https://www.d' || CAST(doc_id % 37 AS VARCHAR) || '.com/p' ||
        |    CAST(doc_id AS VARCHAR) || '-' || CAST(rr AS VARCHAR)
        |    AS target_uri,
        |  CAST(200 AS INT) AS http_status,
        |  'text/html' AS content_type,
        |  CAST(16 + (doc_id * 7 + rr) % 32 AS INT) AS payload_len,
        |  repeat(chr(97 + CAST((doc_id + rr) % 26 AS INT)),
        |    CAST(16 + (doc_id * 7 + rr) % 32 AS INT)) AS payload
        |FROM r""".stripMargin,
    // file-scale WARC replay: the expected per-(file, type, bucket)
    // aggregates derived CLOSED-FORM from the fixture parameters — an
    // independent derivation of lengths/URIs/indices; byte content is
    // REQUIREd in-gate against the LCG generator
    "u_warc_file_ingest" ->
      """WITH f(file_id, seed, n) AS (
        |  VALUES ('big', 1, 110000), ('seg', 2, 500), ('plain', 3, 400)),
        |r AS (
        |  SELECT file_id, seed,
        |    CAST(unnest(range(0, n)) AS INT) AS rr
        |  FROM f),
        |recs AS (
        |  SELECT file_id, 'response' AS warc_type,
        |    CAST((rr + 1) % 16 AS INT) AS bucket,
        |    rr + 1 AS rec_idx,
        |    2048 + (seed * 31 + rr * 97) % 2048 AS payload_len,
        |    'https://www.d' || CAST((seed + rr) % 37 AS VARCHAR) ||
        |      '.com/seg' || CAST(seed AS VARCHAR) || '/p' ||
        |      CAST(rr AS VARCHAR) AS uri
        |  FROM r
        |  UNION ALL
        |  SELECT file_id, 'warcinfo', CAST(0 AS INT), 0, 25, '' FROM f)
        |SELECT file_id, warc_type, bucket,
        |  CAST(count(*) AS BIGINT) AS n_recs,
        |  CAST(sum(payload_len) AS BIGINT) AS sum_len,
        |  CAST(min(rec_idx) AS INT) AS min_idx,
        |  CAST(max(rec_idx) AS INT) AS max_idx,
        |  CAST(count(DISTINCT uri) AS BIGINT) AS n_uris
        |FROM recs
        |GROUP BY file_id, warc_type, bucket""".stripMargin,
    // crawl-to-corpus chain replayed stage by stage: html wrap (+ twin
    // duplication + U+FFFD injection) -> the t_strip_html regex chain ->
    // the t_mojibake artifact-ppm filter -> exact dedup by stripped text
    // -> the t_lang_id scorer -> the t_corpus_report aggregate, all from
    // the SAME shared constants as the Spark ops
    "p_crawl_e2e" -> {
      val hitExprs = TextFunctions.LangProfiles.map { case (lang, sw) =>
        val arr = sw.map(s => s"'$s'").mkString("[", ", ", "]")
        s"len(list_filter(ws, w -> list_contains($arr, w))) AS h_$lang"
      }
      val langs = TextFunctions.LangProfiles.map(_._1)
      val maxExpr = s"greatest(${langs.map("h_" + _).mkString(", ")})"
      val chain = langs
        .map(l => s"WHEN h_$l = mx AND mx > 0 THEN '$l'")
        .mkString(" ")
      def chrs(x: String) = x.map(c => s"chr(${c.toInt})").mkString(" || ")
      val mojiSum = TextFunctions.MojibakeSeqs
        .map(x =>
          s"(length(text) - length(replace(text, ${chrs(x)}, ''))) // ${x.length}")
        .mkString("\n      + ")
      s"""WITH base AS (
         |  SELECT doc_id,
         |    '<html><head><title>t</title></head><body><h1>Doc</h1><p>' ||
         |      text ||
         |      CASE WHEN doc_id % 17 = 0
         |        THEN chr(65533) || chr(65533) || chr(65533) ELSE '' END ||
         |      '</p></body></html>' AS body
         |  FROM documents),
         |docs AS (
         |  SELECT doc_id, body FROM base
         |  UNION ALL
         |  SELECT doc_id + 1000000000, body FROM base WHERE doc_id % 10 = 0),
         |x AS (
         |  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
         |    body,
         |    '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
         |    '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
         |    '(?s)<[^>]*>', ' ', 'g') AS t
         |  FROM docs),
         |ent AS (
         |  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
         |    regexp_replace(regexp_replace(regexp_replace(
         |    t,
         |    '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
         |    '&#39;', CHR(39), 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g')
         |    AS t
         |  FROM x),
         |st AS (
         |  SELECT doc_id, trim(regexp_replace(t, '\\s+', ' ', 'g')) AS text
         |  FROM ent),
         |cnt AS (
         |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS L,
         |    CAST(length(text) - length(replace(text, chr(65533), ''))
         |      AS BIGINT) AS n_replacement,
         |    CAST(length(text) - length(regexp_replace(text,
         |      '[\\x{0080}-\\x{009F}]', '', 'g')) AS BIGINT) AS n_c1,
         |    CAST($mojiSum AS BIGINT) AS n_moji
         |  FROM st),
         |clean AS (
         |  SELECT doc_id, text FROM cnt
         |  WHERE CASE WHEN L = 0 THEN 0
         |    ELSE ((n_replacement + n_c1 + n_moji) * 1000000) // L END = 0),
         |surv AS (
         |  SELECT text, min(doc_id) AS doc_id FROM clean GROUP BY text),
         |b AS (
         |  SELECT text, $WsSql AS ws FROM surv),
         |scored AS (
         |  SELECT text, ws, ${hitExprs.mkString(", ")} FROM b),
         |mxd AS (
         |  SELECT text, ws, *, $maxExpr AS mx FROM scored),
         |langed AS (
         |  SELECT text, ws,
         |    CASE $chain ELSE 'und' END AS pred_lang
         |  FROM mxd),
         |rep AS (
         |  SELECT pred_lang,
         |    coalesce(len(ws), 0) AS toks,
         |    coalesce(len(text), 0) AS chars,
         |    ${hash61Sql("coalesce(text, '')")} AS h
         |  FROM langed)
         |SELECT pred_lang,
         |  count(*) AS n_docs,
         |  CAST(sum(toks) AS BIGINT) AS n_tokens,
         |  CAST(sum(chars) AS BIGINT) AS n_chars,
         |  count(DISTINCT h) AS n_distinct_texts,
         |  CAST(max(toks) AS BIGINT) AS max_tokens,
         |  CAST(sum(toks) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |    AS mean_tokens
         |FROM rep GROUP BY pred_lang""".stripMargin
    },
    // the expected robots rules are derived CLOSED-FORM (independent of
    // the parse): group 1 = the '*' group's directives, group 2 = the
    // stacked two-agent group on doc_id%3=0 docs
    "u_robots_parse" ->
      """SELECT doc_id, CAST(1 AS INT) AS group_idx, '*' AS agent,
        |  'disallow' AS rule, '/admin' AS value FROM documents
        |UNION ALL
        |SELECT doc_id, CAST(1 AS INT), '*', 'allow', '/admin/public'
        |FROM documents WHERE doc_id % 2 = 0
        |UNION ALL
        |SELECT doc_id, CAST(1 AS INT), '*', 'crawl-delay',
        |  CAST(1 + doc_id % 5 AS VARCHAR) FROM documents
        |UNION ALL
        |SELECT doc_id, CAST(1 AS INT), '*', 'disallow', ''
        |FROM documents WHERE doc_id % 5 = 0
        |UNION ALL
        |SELECT doc_id, CAST(2 AS INT), a.agent, 'disallow',
        |  '/p' || CAST(doc_id % 7 AS VARCHAR)
        |FROM documents, (SELECT unnest(['graftbot', 'otherbot']) AS agent) a
        |WHERE doc_id % 3 = 0
        |UNION ALL
        |SELECT doc_id, CAST(0 AS INT), '', 'sitemap',
        |  'https://example.invalid/s.xml' FROM documents""".stripMargin,
    // sitemap rows derived closed-form: index docs (doc_id%4=0) emit
    // their child-sitemap locs, urlset docs one row per url entry
    "u_sitemap_parse" ->
      """WITH dom AS (
        |  SELECT doc_id,
        |    'https://www.d' || CAST(doc_id % 37 AS VARCHAR) || '.com' AS d
        |  FROM documents),
        |idx AS (
        |  SELECT doc_id, CAST(unnest(range(0,
        |    CASE WHEN doc_id % 8 = 0 THEN 2 ELSE 1 END)) AS INT) AS i, d
        |  FROM dom WHERE doc_id % 4 = 0),
        |us AS (
        |  SELECT doc_id,
        |    CAST(unnest(range(0, 1 + doc_id % 3)) AS INT) AS i, d
        |  FROM dom WHERE doc_id % 4 <> 0)
        |SELECT doc_id, 'index' AS kind, i AS entry_idx,
        |  d || '/sitemap-' || CAST(i AS VARCHAR) || '.xml' AS loc,
        |  '' AS lastmod
        |FROM idx
        |UNION ALL
        |SELECT doc_id, 'urlset' AS kind, i AS entry_idx,
        |  d || '/p' || CAST(doc_id AS VARCHAR) || '-' || CAST(i AS VARCHAR)
        |    AS loc,
        |  CASE WHEN doc_id % 5 = 0 AND i = 0 THEN ''
        |       ELSE '2026-0' || CAST(1 + (doc_id + i) % 9 AS VARCHAR) ||
        |         '-01' END AS lastmod
        |FROM us""".stripMargin,
    // crawl-frontier chain replayed closed-form: robots Sitemap rows ->
    // per-sitemap url entries; the doc_id%50=0 j=0 bodies are staged as
    // truncated gzip and must surface as sitemap-corrupt rows instead
    "u_crawl_frontier_e2e" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CAST(unnest(range(0, 1 + doc_id % 2)) AS INT) AS j
        |  FROM documents),
        |su AS (
        |  SELECT doc_id, j,
        |    'https://www.d' || CAST(doc_id % 37 AS VARCHAR) || '.com/s' ||
        |      CAST(doc_id AS VARCHAR) || '-' || CAST(j AS VARCHAR) ||
        |      '.xml' AS sitemap_url
        |  FROM s),
        |e AS (
        |  SELECT doc_id, j, sitemap_url,
        |    CAST(unnest(range(0, 1 + (doc_id + j) % 3)) AS INT) AS k
        |  FROM su WHERE NOT (doc_id % 50 = 0 AND j = 0))
        |SELECT sitemap_url, 'urlset' AS kind, k AS entry_idx,
        |  'https://www.d' || CAST(doc_id % 37 AS VARCHAR) || '.com/p' ||
        |    CAST(doc_id AS VARCHAR) || '-' || CAST(j AS VARCHAR) || '-' ||
        |    CAST(k AS VARCHAR) AS loc,
        |  '2026-0' || CAST(1 + (doc_id + j + k) % 9 AS VARCHAR) || '-01'
        |    AS lastmod
        |FROM e
        |UNION ALL
        |SELECT sitemap_url, 'sitemap-corrupt', CAST(-1 AS INT), '', ''
        |FROM su WHERE doc_id % 50 = 0 AND j = 0""".stripMargin,
    "m_media_report" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0
        |         THEN CAST(8 + doc_id % 5 AS INT)
        |         ELSE CAST(octet_length(encode(text)) % 640 + 16 AS INT)
        |    END AS width,
        |    CASE WHEN doc_id % 2 = 0
        |         THEN CAST(8 + doc_id % 3 AS INT)
        |         ELSE CAST((octet_length(encode(text)) * 7) % 480 + 16 AS INT)
        |    END AS height,
        |    CASE WHEN doc_id % 2 = 0
        |         THEN 1
        |         ELSE CAST(octet_length(encode(text)) % 24 + 1 AS INT)
        |    END AS n_frames,
        |    CASE WHEN doc_id % 2 = 0 THEN 'png'
        |         WHEN octet_length(encode(text)) % 2 = 0 THEN 'even'
        |         ELSE 'odd' END AS format
        |  FROM documents)
        |SELECT format, CAST(count(*) AS BIGINT) AS n_items,
        |  max(width) AS max_width, max(height) AS max_height,
        |  CAST(sum(n_frames) AS BIGINT) AS total_frames
        |FROM m GROUP BY format""".stripMargin,
    "u_canonical" ->
      s"""WITH ${urlDomainCtes(UrlSql)},
         |$CanonQueryCte
         |SELECT doc_id, host, domain,
         |  $CanonUrlSql AS url_canon
         |FROM f""".stripMargin,
    "u_domain_cap" ->
      s"""WITH ${urlDomainCtes(UrlSql)}
         |SELECT doc_id, domain FROM (
         |  SELECT doc_id, domain,
         |    row_number() OVER (PARTITION BY domain
         |      ORDER BY ${hash61Sql("'quota:' || CAST(doc_id AS VARCHAR)")},
         |        doc_id) AS rn
         |  FROM dm) WHERE rn <= 3""".stripMargin,
    "u_outlinks" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    '<p>' || text || '</p><a href="' ||
         |      'https://www.d' || CAST(doc_id % 37 AS VARCHAR) ||
         |      '.co.uk/p' || CAST(doc_id AS VARCHAR) ||
         |    '">x</a> <nav><a href="' ||
         |      'http://blog.d' || CAST(doc_id % 41 AS VARCHAR) ||
         |      '.com/q?id=' || CAST(doc_id AS VARCHAR) ||
         |    '">y</a></nav>' AS html
         |  FROM documents),
         |u AS (
         |  SELECT doc_id,
         |    unnest(regexp_extract_all(html, 'href="([^"]+)"', 1)) AS url
         |  FROM h),
         |$UrlParseCtes
         |SELECT domain, count(*) AS n_links,
         |  count(DISTINCT doc_id) AS n_docs
         |FROM dm GROUP BY domain""".stripMargin,
    "u_domain_block" ->
      s"""WITH ${urlDomainCtes(UrlSql)}
         |SELECT doc_id, url FROM dm
         |WHERE domain NOT IN (
         |  SELECT domain FROM dm WHERE domain LIKE '%.io')""".stripMargin,
    "u_url_dedup" ->
      s"""WITH ${urlDomainCtes(DupUrlSql)},
         |$CanonQueryCte,
         |c AS (SELECT doc_id, $CanonUrlSql AS url_canon FROM f),
         |r AS (
         |  SELECT doc_id, url_canon,
         |    row_number() OVER (PARTITION BY url_canon ORDER BY doc_id)
         |      AS rn
         |  FROM c)
         |SELECT doc_id, url_canon FROM r WHERE rn = 1""".stripMargin,
    "t_zorder" ->
      (s"SELECT o_orderkey, ${zorderSql(Seq("o_custkey", "o_orderkey"), 21)}" +
        " AS zval FROM orders"),
    "s_lsh_bucket" ->
      s"""SELECT vec_id, ${embBucketSql("embedding", 8)} AS bucket
         |FROM embeddings""".stripMargin,
    "p_web_curation_e2e" ->
      s"""WITH ${urlDomainCtes(DupUrlSql)},
         |$CanonQueryCte,
         |cc AS (SELECT doc_id, domain, $CanonUrlSql AS url_canon FROM f),
         |d1 AS (SELECT doc_id, domain FROM (
         |  SELECT doc_id, domain,
         |    row_number() OVER (PARTITION BY url_canon ORDER BY doc_id)
         |      AS rn
         |  FROM cc) WHERE rn = 1),
         |d2 AS (SELECT doc_id FROM (
         |  SELECT doc_id,
         |    row_number() OVER (PARTITION BY domain
         |      ORDER BY ${hash61Sql("'quota:' || CAST(doc_id AS VARCHAR)")},
         |        doc_id) AS rn
         |  FROM d1) WHERE rn <= 3),
         |q AS (
         |  SELECT d.doc_id, d.n_chars, len($WsSql) AS ntok
         |  FROM documents d JOIN d2 USING (doc_id)
         |  WHERE len($WsSql) >= 20),
         |b AS (
         |  SELECT doc_id,
         |    sum(ntok) OVER (ORDER BY n_chars DESC, doc_id) AS cum
         |  FROM q)
         |SELECT doc_id, CAST(cum AS BIGINT) AS cum_tokens
         |FROM b WHERE cum <= 3000""".stripMargin,
    "t_cms_counts" ->
      s"""WITH tok AS (
         |  SELECT unnest($WsSql) AS w FROM documents),
         |e AS (SELECT w, unnest([0, 1, 2]) AS r FROM tok),
         |sk AS (
         |  SELECT r,
         |    ${hash61Sql("'cms' || CAST(r AS VARCHAR) || ':' || w")} % 1024
         |      AS bucket,
         |    count(*) AS c
         |  FROM e GROUP BY 1, 2),
         |probe AS (SELECT unnest(
         |  ['the', 'a', 'spark', 'table', 'hash', 'zzz_nothere']) AS w),
         |pe AS (SELECT w, unnest([0, 1, 2]) AS r FROM probe),
         |j AS (
         |  SELECT pe.w, coalesce(sk.c, 0) AS c FROM pe LEFT JOIN sk
         |  ON sk.r = pe.r AND sk.bucket =
         |    ${hash61Sql("'cms' || CAST(pe.r AS VARCHAR) || ':' || pe.w")}
         |      % 1024)
         |SELECT w, CAST(min(c) AS BIGINT) AS est FROM j GROUP BY w"""
        .stripMargin,
    "t_pii_redact" ->
      s"""SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(
         |    'Contact ' || source || '@' || lang || 'mail.com or 10.0.' ||
         |      CAST(doc_id % 256 AS VARCHAR) || '.' ||
         |      CAST(doc_id % 100 AS VARCHAR) || ' call +1 555 ' ||
         |      CAST(doc_id % 900 + 100 AS VARCHAR) || ' ' ||
         |      CAST(doc_id % 9000 + 1000 AS VARCHAR) || ' now',
         |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
         |    '<EMAIL>', 'g'),
         |    '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'),
         |    '\\+?\\d[\\d\\s().-]{7,}\\d', '<PHONE>', 'g') AS redacted
         |FROM documents""".stripMargin,
    // normalize_answer: lowercase -> strip [[:punct:]] (RE2 spelling of
    // Java's \p{Punct} — same ASCII set) -> drop articles -> collapse ws
    "t_norm_answer" ->
      s"""SELECT doc_id,
         |  trim(regexp_replace(regexp_replace(regexp_replace(
         |    lower('The Answer: ' || upper(substr(text, 1, 40)) ||
         |      ', an (extra) word; THE end #' ||
         |      CAST(doc_id % 10 AS VARCHAR) || '!'),
         |    '[[:punct:]]', ' ', 'g'),
         |    '\\b(a|an|the)\\b', ' ', 'g'),
         |    '\\s+', ' ', 'g')) AS norm
         |FROM documents""".stripMargin,
    // NFC canonicalization: decompose each 'e' to e+U+0301 (chr(769)),
    // then DuckDB's nfc_normalize must agree byte-for-byte with the
    // native NfcNormalizeF — lengths count code points on both engines
    "t_nfc_norm" -> {
      val dec = "replace(text, 'e', 'e' || chr(769))"
      s"""SELECT doc_id,
         |  CAST(length($dec) AS INT) AS n_decomposed,
         |  CAST(length(nfc_normalize($dec)) AS INT) AS n_composed,
         |  ${hash61Sql(s"nfc_normalize($dec)")} AS norm_hash
         |FROM documents""".stripMargin
    },
    "t_vocab_topk" ->
      s"""WITH t AS (
         |  SELECT unnest($WsSql) AS token FROM documents),
         |c AS (
         |  SELECT token, CAST(count(*) AS BIGINT) AS count
         |  FROM t GROUP BY token HAVING count(*) >= 2),
         |r AS (
         |  SELECT token, count,
         |    row_number() OVER (ORDER BY count DESC, token ASC) AS rank,
         |    sum(count) OVER (ORDER BY count DESC, token ASC
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM c)
         |SELECT token, count, CAST(rank AS INT) AS rank,
         |  CAST(cum AS BIGINT) AS cum_count
         |FROM r WHERE rank <= 200""".stripMargin,
    // PMI ratio in 128-bit HUGEINT (exact, like Spark's DECIMAL(38,0));
    // bigrams rebuilt positionally so w1/w2 match the shingle split
    "t_pmi_bigrams" ->
      s"""WITH d AS (SELECT $WsSql AS ws FROM documents),
         |tot AS (SELECT CAST(sum(len(ws)) AS HUGEINT) AS n FROM d),
         |uc AS (
         |  SELECT token, CAST(count(*) AS BIGINT) AS c FROM (
         |    SELECT unnest(ws) AS token FROM d) GROUP BY token),
         |bc AS (
         |  SELECT bg, CAST(count(*) AS BIGINT) AS c_xy FROM (
         |    SELECT unnest(list_transform(range(1, len(ws)),
         |      i -> ws[i] || ' ' || ws[i+1])) AS bg FROM d)
         |  GROUP BY bg HAVING count(*) >= 5),
         |sp AS (
         |  SELECT split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2,
         |    c_xy FROM bc),
         |sc AS (
         |  SELECT w1, w2, c_xy, a.c AS c_x, b.c AS c_y,
         |    CAST((CAST(c_xy AS HUGEINT) * (SELECT n FROM tot) * 1000000) //
         |      (CAST(a.c AS HUGEINT) * CAST(b.c AS HUGEINT)) AS BIGINT)
         |      AS ratio_ppm
         |  FROM sp JOIN uc a ON sp.w1 = a.token JOIN uc b ON sp.w2 = b.token),
         |r AS (
         |  SELECT sc.*, row_number() OVER (
         |    ORDER BY ratio_ppm DESC, w1 ASC, w2 ASC) AS rank
         |  FROM sc)
         |SELECT w1, w2, c_xy, c_x, c_y, ratio_ppm, CAST(rank AS INT) AS rank
         |FROM r WHERE rank <= 100""".stripMargin,
    "p_stream_exact_dedup" ->
      """SELECT md5(text) AS content_md5, min(doc_id) AS doc_id_kept,
        |  count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    // replays the streamed band-bucket registry, then the batch join-back
    // verdict, from the SAME minhash constants as the Spark side
    "p_stream_lsh_dedup" ->
      s"""WITH $minhashPairCtes,
         |reg AS (
         |  SELECT band, band_key, min(doc_id) AS min_id
         |  FROM banded GROUP BY 1, 2)
         |SELECT b.doc_id, count(*) AS n_bands,
         |  min(r.min_id) AS smallest_neighbor,
         |  min(r.min_id) = b.doc_id AS survived
         |FROM banded b JOIN reg r
         |  ON b.band = r.band AND b.band_key = r.band_key
         |GROUP BY b.doc_id""".stripMargin,
    "t_line_filter" ->
      s"""WITH m AS (
         |  SELECT doc_id,
         |    'This is a proper sentence.' || chr(10) || 'ok' || chr(10) ||
         |    'no terminal punct here' || chr(10) ||
         |    CASE WHEN doc_id % 2 = 0 THEN 'Another good line stays!'
         |         ELSE 'too short.' END || chr(10) ||
         |    'Final words for doc ' || CAST(doc_id AS VARCHAR) || ' right?'
         |      AS text
         |  FROM documents)
         |SELECT doc_id,
         |  coalesce(array_to_string(list_filter(string_split(text, chr(10)),
         |    l -> len(regexp_split_to_array(trim(l), '\\s+')) >= 3
         |      AND regexp_matches(trim(l),
         |        '[.!?"]["'')\\]]?${"$"}')), chr(10)), '') AS kept
         |FROM m""".stripMargin,
    "t_balanced_shards" ->
      """SELECT doc_id,
        |  CAST((row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1) % 8
        |    AS INT) AS shard
        |FROM documents""".stripMargin,
    "t_shard_manifest" ->
      """WITH a AS (
        |  SELECT doc_id, n_chars,
        |    CAST((row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1) % 8
        |      AS INT) AS shard
        |  FROM documents)
        |SELECT shard, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_weight,
        |  md5(string_agg(CAST(doc_id AS VARCHAR), ','
        |    ORDER BY CAST(doc_id AS VARCHAR))) AS content_md5
        |FROM a GROUP BY shard""".stripMargin,
    "s_cluster_sample" -> {
      def dotSql(x: String, y: String) =
        s"list_reduce(list_transform(range(1, len($x) + 1), " +
          s"i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)), (acc, v) -> acc + v)"
      s"""WITH c AS (
         |  SELECT vec_id AS cid, embedding AS cv FROM embeddings
         |  WHERE vec_id < 4),
         |s AS (
         |  SELECT e.vec_id, c.cid, ${dotSql("e.embedding", "c.cv")} AS score
         |  FROM embeddings e CROSS JOIN c),
         |r AS (
         |  SELECT vec_id, cid,
         |    row_number() OVER (PARTITION BY vec_id
         |      ORDER BY score DESC, cid ASC) AS rn
         |  FROM s),
         |a AS (SELECT vec_id, CAST(cid AS INT) AS cell FROM r WHERE rn = 1)
         |SELECT vec_id, cell FROM (
         |  SELECT vec_id, cell, row_number() OVER (PARTITION BY cell
         |    ORDER BY ${hash61Sql("'quota:' || CAST(vec_id AS VARCHAR)")},
         |      vec_id) AS qrn
         |  FROM a) WHERE qrn <= 40""".stripMargin
    },
    "s_jl_project" -> {
      def jlDotSql(p: Int) = {
        val sign = s"(CASE WHEN (${hash61Sql(s"'jl$p:' || CAST(i AS VARCHAR)")} & 1) = 1 " +
          "THEN 1.0 ELSE -1.0 END)"
        s"list_reduce(list_transform(range(1, len(embedding) + 1), " +
          s"i -> CAST(embedding[i] AS DOUBLE) * $sign), (acc, x) -> acc + x)"
      }
      s"""SELECT vec_id,
         |  ${(0 until 4).map(p => s"${jlDotSql(p)} AS y$p").mkString(",\n  ")}
         |FROM embeddings""".stripMargin
    },
    "s_semantic_decontaminate" ->
      """WITH q8 AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(FLOOR(CAST(x AS DOUBLE) / s + 0.5) AS BIGINT)) AS q
        |  FROM (
        |    SELECT vec_id, embedding,
        |      CASE WHEN m = 0 THEN CAST(1.0 AS DOUBLE) ELSE m / 127 END AS s
        |    FROM (SELECT vec_id, embedding,
        |      list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
        |        AS m
        |      FROM embeddings))),
        |n AS (
        |  SELECT vec_id, q,
        |    CAST(list_reduce(list_transform(range(1, len(q)+1),
        |      i -> q[i]*q[i]), (a,v) -> a+v) AS BIGINT) AS nn
        |  FROM q8),
        |pr AS (
        |  SELECT c.vec_id AS cid, b.vec_id AS bid,
        |    CAST(list_reduce(list_transform(range(1, len(c.q)+1),
        |      i -> c.q[i]*b.q[i]), (a,v) -> a+v) AS BIGINT) AS d,
        |    c.nn AS nv, b.nn AS nb
        |  FROM n c, n b WHERE c.vec_id % 50 <> 0 AND b.vec_id % 50 = 0),
        |hits AS (
        |  SELECT cid, bid FROM pr
        |  WHERE d > 0 AND
        |    CAST(d AS HUGEINT) * d * 10 * 10 >= CAST(3 AS HUGEINT) * 3 * nv * nb)
        |SELECT cid AS vec_id, CAST(count(*) AS BIGINT) AS n_hits,
        |  min(bid) AS first_bench_id
        |FROM hits GROUP BY cid""".stripMargin,
    "s_centroid_outliers" ->
      """WITH q8 AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding,
        |      x -> CAST(FLOOR(CAST(x AS DOUBLE) / s + 0.5) AS BIGINT)) AS q
        |  FROM (
        |    SELECT vec_id, label, embedding,
        |      CASE WHEN m = 0 THEN CAST(1.0 AS DOUBLE) ELSE m / 127 END AS s
        |    FROM (SELECT vec_id, label, embedding,
        |      list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
        |        AS m
        |      FROM embeddings))),
        |dims AS (
        |  SELECT label, i, sum(q[i]) AS s
        |  FROM q8, unnest(range(1, len(q)+1)) AS t(i)
        |  GROUP BY label, i),
        |cent AS (SELECT label, list(s ORDER BY i) AS c FROM dims GROUP BY label),
        |centq AS (
        |  SELECT label,
        |    list_transform(c,
        |      x -> CAST(FLOOR(CAST(x AS DOUBLE) / cs + 0.5) AS BIGINT)) AS cq
        |  FROM (
        |    SELECT label, c,
        |      CASE WHEN cm = 0 THEN CAST(1.0 AS DOUBLE) ELSE cm / 127 END AS cs
        |    FROM (SELECT label, c,
        |      list_max(list_transform(c, x -> abs(CAST(x AS DOUBLE)))) AS cm
        |      FROM cent))),
        |j AS (
        |  SELECT q8.vec_id, q8.label,
        |    CAST(list_reduce(list_transform(range(1, len(q)+1),
        |      i -> q[i]*cq[i]), (a,v) -> a+v) AS BIGINT) AS cdot,
        |    CAST(list_reduce(list_transform(range(1, len(q)+1),
        |      i -> q[i]*q[i]), (a,v) -> a+v) AS BIGINT) AS nv,
        |    CAST(list_reduce(list_transform(range(1, len(cq)+1),
        |      i -> cq[i]*cq[i]), (a,v) -> a+v) AS BIGINT) AS nc
        |  FROM q8 JOIN centq USING (label))
        |SELECT vec_id, label, cdot, nv, nc,
        |  NOT (cdot > 0 AND
        |    CAST(cdot AS HUGEINT) * cdot * 10 * 10 >=
        |    CAST(1 AS HUGEINT) * 1 * nv * nc) AS is_outlier
        |FROM j""".stripMargin,
    "s_quantize_int8" ->
      s"""WITH $QuantizeCtes
         |SELECT vec_id, s AS scale,
         |  CAST(len(list_filter(q, v -> abs(v) = 127)) AS INT) AS n_sat,
         |  CAST(list_sum(q) AS BIGINT) AS sum_q,
         |  CAST(list_sum(list_transform(q, v -> abs(v))) AS BIGINT)
         |    AS sum_abs_q
         |FROM q8""".stripMargin,
    "s_quant_topk" -> quantTopkSql(nQueries = 100, k = 5),
    // sign bits replayed with 1::BIGINT << j (j ≤ 31 — the 32-dims-per-
    // word split keeps both engines' signed-64 arithmetic exact)
    "s_sign_hamming" -> {
      def word(w: Int) =
        s"""CAST(list_sum(list_transform(range(0, 32), j ->
           |      CASE WHEN embedding[${w * 32} + j + 1] >= 0
           |        THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)) AS BIGINT)"""
          .stripMargin
      s"""WITH p AS (
         |  SELECT vec_id, ${word(0)} AS w0, ${word(1)} AS w1
         |  FROM embeddings),
         |q AS (SELECT * FROM p WHERE vec_id < 20),
         |d AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
         |    CAST(bit_count(xor(q.w0, c.w0)) +
         |         bit_count(xor(q.w1, c.w1)) AS BIGINT) AS dist
         |  FROM q JOIN p c ON c.vec_id <> q.vec_id),
         |r AS (
         |  SELECT *, CAST(row_number() OVER (
         |    PARTITION BY query_id ORDER BY dist, vec_id) AS INT) AS rank
         |  FROM d)
         |SELECT query_id, rank, vec_id, dist FROM r WHERE rank <= 10"""
        .stripMargin
    },

    // MIPS: same quantized pair dots, ranked by the de-quantized inner
    // product (qdot·s_q)·s_c — association order mirrors the Spark gate
    "s_mips_topk" ->
      s"""WITH $QuantizeCtes,
         |pr AS (
         |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |    CAST(list_reduce(
         |      list_transform(range(1, len(a.q)+1), i -> a.q[i]*b.q[i]),
         |      (acc, v) -> acc + v) AS BIGINT) AS qdot,
         |    a.s AS qs, b.s AS cs
         |  FROM q8 a, q8 b WHERE a.vec_id < 100 AND a.vec_id <> b.vec_id),
         |sc AS (
         |  SELECT query_id, neighbor_id, qdot,
         |    (CAST(qdot AS DOUBLE) * qs) * cs AS mips_score
         |  FROM pr)
         |SELECT query_id, neighbor_id, rank, qdot, mips_score FROM (
         |  SELECT sc.*, row_number() OVER (PARTITION BY query_id
         |    ORDER BY mips_score DESC, neighbor_id) AS rank
         |  FROM sc) WHERE rank <= 5""".stripMargin,

    // s_mutual_nn (NEW r11): all even-odd pair scores over the shared
    // quantization CTE, top-1 each direction, inner-join = mutuality
    "s_mutual_nn" ->
      s"""WITH $QuantizeCtes,
         |n AS (
         |  SELECT vec_id, q,
         |    CAST(list_reduce(
         |      list_transform(range(1, len(q)+1), i -> q[i]*q[i]),
         |      (acc, v) -> acc + v) AS BIGINT) AS nrm
         |  FROM q8),
         |pr AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    CAST(list_reduce(
         |      list_transform(range(1, len(a.q)+1), i -> a.q[i]*b.q[i]),
         |      (acc, v) -> acc + v) AS BIGINT) AS qdot,
         |    a.nrm AS na, b.nrm AS nb
         |  FROM n a, n b WHERE a.vec_id % 2 = 0 AND b.vec_id % 2 = 1),
         |sc AS (
         |  SELECT id_a, id_b, qdot,
         |    CASE WHEN na = 0 OR nb = 0 THEN CAST(0.0 AS DOUBLE)
         |      ELSE CAST(qdot AS DOUBLE) /
         |        (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) END
         |      AS qcos
         |  FROM pr),
         |ta AS (
         |  SELECT id_a, id_b, qdot, qcos FROM (
         |    SELECT sc.*, row_number() OVER (PARTITION BY id_a
         |      ORDER BY qcos DESC, id_b) AS rn FROM sc) WHERE rn = 1),
         |tb AS (
         |  SELECT id_a, id_b FROM (
         |    SELECT id_a, id_b, row_number() OVER (PARTITION BY id_b
         |      ORDER BY qcos DESC, id_a) AS rn FROM sc) WHERE rn = 1)
         |SELECT ta.id_a, ta.id_b, ta.qdot, ta.qcos
         |FROM ta JOIN tb ON ta.id_a = tb.id_a AND ta.id_b = tb.id_b""".stripMargin,

    // s_ann_recall (NEW r10): recall@k of the integer-exact IVF search
    // (nprobe < cells) against the quantized brute-force truth over the
    // same codes — BOTH sides are the full deterministic replays already
    // gated individually, composed here into verified recall numbers
    "s_ann_recall" ->
      s"""WITH ann AS ($ivfIntTopkSql),
         |tr AS (${quantTopkSql(nQueries = IvfIntNQueries, k = IvfIntK)}),
         |h AS (
         |  SELECT a.query_id, CAST(count(*) AS BIGINT) AS n_hits
         |  FROM ann a JOIN tr t
         |    ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
         |  GROUP BY a.query_id),
         |s AS (
         |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_truth
         |  FROM tr GROUP BY query_id)
         |SELECT s.query_id, s.n_truth,
         |  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
         |  CAST((coalesce(h.n_hits, 0) * 1000000) // s.n_truth AS BIGINT)
         |    AS recall_ppm
         |FROM s LEFT JOIN h ON s.query_id = h.query_id""".stripMargin,

    // P73: the trained integer k-means centroids themselves — every value
    // an exact integer from the unrolled-iteration replay
    "s_ivf_int_centroids" ->
      s"""WITH $QuantizeCtes,
         |${ivfIntTrainCtes(IvfIntCells, IvfIntIters)}
         |SELECT CAST(cid AS INT) AS cell, CAST(i - 1 AS INT) AS dim,
         |  CAST(val AS INT) AS value
         |FROM c$IvfIntIters""".stripMargin,

    // P73: integer-exact IVF search end-to-end — train (unrolled rounds),
    // assign the corpus with the final centroids, probe each query's
    // nprobe best cells, rank exact quantized cosine (def shared with the
    // s_ann_recall composition)
    "s_ivf_int_topk" -> ivfIntTopkSql,

    // P74: the trained PQ codebooks — exact integers from the unrolled
    // per-subspace replay
    "s_pq_codebooks" ->
      s"""WITH $QuantizeCtes,
         |${pqTrainCtes(PqM, PqCells, PqIters)}
         |${(0 until PqM)
          .map(s =>
            s"SELECT CAST($s AS INT) AS subspace, CAST(cid AS INT) AS cell, " +
              s"CAST(i - 1 AS INT) AS dim, CAST(val AS INT) AS value " +
              s"FROM b${s}_$PqIters")
          .mkString("\n UNION ALL\n ")}""".stripMargin,

    // P74: ADC search — per-subspace codes under the final books, query
    // LUT rows, exact-long score sums
    "s_pq_topk" -> {
      val codeCtes = (0 until PqM).map { s =>
        s"""pc$s AS (
           |  SELECT vec_id, cid FROM (
           |    SELECT ns.vec_id, m.cid,
           |      row_number() OVER (PARTITION BY ns.vec_id
           |        ORDER BY 2 * ${intDotLongSql("ns.qs", "m.cv")} - m.n2c
           |          DESC, m.cid ASC) AS rn
           |    FROM ns$s ns CROSS JOIN pm${s}_$PqIters m) WHERE rn = 1),
           |pq$s AS (
           |  SELECT ns.vec_id AS query_id, m.cid,
           |    ${intDotLongSql("ns.qs", "m.cv")} AS w
           |  FROM ns$s ns CROSS JOIN pm${s}_$PqIters m
           |  WHERE ns.vec_id < $PqNQueries),
           |pp$s AS (
           |  SELECT l.query_id, c.vec_id AS neighbor_id, l.w
           |  FROM pc$s c JOIN pq$s l ON l.cid = c.cid)""".stripMargin
      }
      s"""WITH $QuantizeCtes,
         |${pqTrainCtes(PqM, PqCells, PqIters)},
         |${codeCtes.mkString(",\n")},
         |pcand AS (
         |  SELECT query_id, neighbor_id, CAST(sum(w) AS BIGINT) AS adc
         |  FROM (${(0 until PqM)
          .map(s => s"SELECT * FROM pp$s")
          .mkString(" UNION ALL ")})
         |  WHERE query_id <> neighbor_id
         |  GROUP BY query_id, neighbor_id)
         |SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rank, adc
         |FROM (
         |  SELECT pcand.*, row_number() OVER (PARTITION BY query_id
         |    ORDER BY adc DESC, neighbor_id ASC) AS rnk
         |  FROM pcand) WHERE rnk <= $PqK""".stripMargin
    }
  )
}
