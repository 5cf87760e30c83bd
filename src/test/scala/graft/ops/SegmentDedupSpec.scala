package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SegmentDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], segSize: Int = 2) =
    Dedup
      .dedupSegments(
        docs.toDF("doc_id", "text"),
        "doc_id",
        Chunking.wordWindows(col("text"), segSize))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("first occurrence survives; later repeats drop; order preserved") {
    val out = run(Seq(
      1L -> "a b c d e f",   // segments: "a b" "c d" "e f"
      2L -> "c d x y",       // "c d" seen in doc 1 -> dropped; "x y" kept
      3L -> "e f a b"))      // both segments seen -> doc comes back empty
    out(1L) shouldBe (("a b c d e f", 3L, 0L))
    out(2L) shouldBe (("x y", 1L, 1L))
    out(3L) shouldBe (("", 0L, 2L))
  }

  test("duplicate segment inside ONE doc also dedupes (first position wins)") {
    val out = run(Seq(1L -> "a b a b c d"))
    out(1L) shouldBe (("a b c d", 2L, 1L))
  }

  test("keeper is the minimum (doc_id, pos) across the corpus") {
    // "z z" appears at pos 1 of doc 5 and pos 0 of doc 9: doc 5 wins on id
    val out = run(Seq(5L -> "m m z z", 9L -> "z z q q"))
    out(5L) shouldBe (("m m z z", 2L, 0L))
    out(9L) shouldBe (("q q", 1L, 1L))
  }

  test("window mode produces the identical result on a boilerplate-heavy corpus") {
    // one segment ("x x") repeated across most docs — the hot-hash case.
    // skewSafe (two-phase agg+join) is the default; the window mode is the
    // opt-out for corpora known to have no hot segments, and must agree.
    val docs = (1L to 60L).map { i =>
      i -> (if (i % 3 == 0) s"u$i v$i x x" else s"x x u$i v$i")
    }
    val agg = run(docs) // default: skewSafe
    val window = Dedup
      .dedupSegments(
        docs.toDF("doc_id", "text"),
        "doc_id",
        Chunking.wordWindows(col("text"), 2),
        skewSafe = false)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    agg shouldBe window
    // "x x" survives exactly once corpus-wide
    agg.values.count(_._1.contains("x x")) shouldBe 1
  }

  test("every input doc appears in the output exactly once") {
    val docs = (1L to 40L).map(i => i -> s"w${i % 7} w${i % 7} tail$i x")
    val out = run(docs)
    out.keySet shouldBe docs.map(_._1).toSet
    // conservation: kept + dropped = total segments per doc
    out.values.foreach { case (_, kept, dropped) =>
      kept + dropped shouldBe 2L
    }
  }

  test("graft.syntax exposes the r7 operators fluently") {
    import graft.syntax._
    val docs = Seq((1L, "a b c d", "en"), (2L, "a b e f", "en"), (3L, "x", "de"))
      .toDF("doc_id", "text", "lang")
    docs.chunkWords("doc_id", col("text"), 2).count() shouldBe 5L
    docs
      .dedupSegments("doc_id", Chunking.wordWindows(col("text"), 2))
      .count() shouldBe 3L
    docs.quotaSample("doc_id", 1, Seq("lang")).count() shouldBe 2L
    docs
      .dropSeenIn("text", Seq("x").toDF("t"), "t")
      .collect()
      .map(_.getLong(0))
      .toSet shouldBe Set(1L, 2L)
    docs
      .bloomSemiJoin("doc_id", Seq(2L, 3L).toDF("k"), "k")
      .count() shouldBe 2L
  }

  test("dropSeenIn removes exact text matches against another corpus") {
    val corpus = Seq(
      (1L, "alpha beta"),
      (2L, "gamma delta"),
      (3L, "epsilon zeta")).toDF("doc_id", "text")
    val seen = Seq("gamma delta", "unrelated").toDF("t")
    val kept = Dedup
      .dropSeenIn(corpus, "text", seen, "t")
      .collect()
      .map(_.getLong(0))
      .toSet
    kept shouldBe Set(1L, 3L)
    // schema unchanged (no helper columns leak)
    Dedup.dropSeenIn(corpus, "text", seen, "t").columns.toSeq shouldBe
      Seq("doc_id", "text")
  }

  test("semanticDedup keeps one representative per embedding cluster") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.999f, 0.01f, 0.0f)), // near-dup of 1 -> dropped
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.0f, 0.98f, 0.1f)),   // near-dup of 3 -> dropped
      (5L, Array(0.0f, 0.0f, 1.0f)))    // singleton -> kept
    val out = Similarity
      .semanticDedup(
        vecs.toDF("vec_id", "embedding"),
        "vec_id",
        "embedding",
        threshold = 0.95,
        planes = 1)
      .collect()
      .map(_.getLong(0))
      .toSet
    out shouldBe Set(1L, 3L, 5L)
  }
}

class CrossNearDupSpec extends SparkSpec {
  import spark.implicits._

  test("dropNearSeenIn drops near- and exact dups of the seen corpus") {
    val fresh = Seq(
      (2L, "the quick brown fox jumps over the lazy dog today"), // near-dup
      (4L, "the quick brown fox jumps over the lazy dog tonight"), // exact
      (6L, "completely different text with other words entirely here"),
      (8L, "tiny")) // < 3 words: cannot shingle, must be kept
      .toDF("doc_id", "text")
    val seen = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "some archived document nothing like the new crawl at all"))
      .toDF("doc_id", "text")
    val out = Dedup.dropNearSeenIn(fresh, "text", seen, "text")
    out.collect().map(_.getLong(0)).toSet shouldBe Set(6L, 8L)
    // schema unchanged (no helper columns leak)
    out.columns.toSeq shouldBe Seq("doc_id", "text")
    Par.releaseCaches()
  }

  test("dropNearSeenIn with an empty seen corpus keeps everything") {
    val fresh = Seq((1L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val seen = Seq.empty[(Long, String)].toDF("doc_id", "text")
    Dedup.dropNearSeenIn(fresh, "text", seen, "text")
      .count() shouldBe 1L
    Par.releaseCaches()
  }
}

class WithinDocDedupSpec extends SparkSpec {
  import spark.implicits._

  test("dedupSegmentsWithinDoc keeps first occurrence per doc only") {
    // doc 1 repeats "a b"; doc 2 independently contains "a b" and keeps it
    // (intra-doc semantics: no cross-doc suppression)
    val docs = Seq(
      (1L, Seq("a b", "c d", "a b", "a b")),
      (2L, Seq("a b", "x y"))).toDF("doc_id", "segs")
    val out = Dedup
      .dedupSegmentsWithinDoc(docs, "doc_id", col("segs"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3))))
      .toMap
    out(1L) shouldBe (("a b c d", 2, 2))
    out(2L) shouldBe (("a b x y", 2, 0))
  }

  test("dedupSegmentsWithinDoc: null and empty arrays yield empty docs") {
    val docs = Seq(
      (1L, null.asInstanceOf[Seq[String]]),
      (2L, Seq.empty[String])).toDF("doc_id", "segs")
    val out = Dedup
      .dedupSegmentsWithinDoc(docs, "doc_id", col("segs"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3))))
      .toMap
    out(1L) shouldBe (("", 0, 0))
    out(2L) shouldBe (("", 0, 0))
  }

  test("dedupSegmentsWithinDoc adds no shuffle of its own") {
    // pre-widen the input so Par.fan's small-scan repartition (the only
    // Exchange allowed) is already present in the baseline plan
    val docs = Seq((1L, Seq("a", "b"))).toDF("doc_id", "segs")
      .repartition(spark.sparkContext.defaultParallelism)
    def exchanges(p: String) = "Exchange".r.findAllIn(p).size
    val base = exchanges(docs.queryExecution.executedPlan.toString)
    val plan = Dedup
      .dedupSegmentsWithinDoc(docs, "doc_id", col("segs"))
      .queryExecution.executedPlan.toString
    exchanges(plan) shouldBe base
  }
}

class WithinDocNullSegmentSpec extends SparkSpec {
  import spark.implicits._

  test("dropFrequentSegments removes EVERY occurrence of hot segments") {
    // "c d" appears in docs 1, 2 and 3 (df=3); "a b" in docs 1 and 3
    // (df=2); "x y" only in doc 2 (df=1). minDocs=2 drops ALL copies of
    // both hot segments — including the first occurrences dedupSegments
    // would keep — while the doc-unique segment survives.
    val docs = Seq(
      1L -> "a b c d",
      2L -> "c d x y",
      3L -> "c d a b").toDF("doc_id", "text")
    val out = Dedup
      .dropFrequentSegments(
        docs, "doc_id", Chunking.wordWindows(col("text"), 2), minDocs = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    out(1L) shouldBe (("", 0L, 2L))
    out(2L) shouldBe (("x y", 1L, 1L))
    out(3L) shouldBe (("", 0L, 2L))
  }

  test("groupCols scope the df rule: same-source templates drop, cross-source phrases survive") {
    // "c d" is shared by two docs of site A (template -> dropped there)
    // and by one doc of site B (df=1 within B -> SURVIVES there); the
    // global variant would have nuked it everywhere
    val docs = Seq(
      (1L, "A", "a b c d"),
      (2L, "A", "c d x y"),
      (3L, "B", "c d e f")).toDF("doc_id", "source", "text")
    val out = Dedup
      .dropFrequentSegments(
        docs, "doc_id", Chunking.wordWindows(col("text"), 2), minDocs = 2,
        groupCols = Seq("source"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    out(1L) shouldBe (("a b", 1L, 1L))
    out(2L) shouldBe (("x y", 1L, 1L))
    out(3L) shouldBe (("c d e f", 2L, 0L))
    // empty groupCols = the original global rule
    val global = Dedup
      .dropFrequentSegments(
        docs, "doc_id", Chunking.wordWindows(col("text"), 2), minDocs = 2)
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    global(3L) shouldBe "e f"
  }

  test("dropFrequentSegments: within-doc repeats do not cross the threshold") {
    // "q q" repeats 3x inside doc 1 but appears in only ONE document —
    // document frequency is per-DISTINCT-doc, so a chorus survives intact
    val docs = Seq(
      1L -> "q q q q q q",
      2L -> "z z").toDF("doc_id", "text")
    val out = Dedup
      .dropFrequentSegments(
        docs, "doc_id", Chunking.wordWindows(col("text"), 2), minDocs = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    out(1L) shouldBe (("q q q q q q", 3L, 0L))
    out(2L) shouldBe (("z z", 1L, 0L))
  }

  test("dedupSegmentsWithinDoc drops null segments consistently") {
    // null elements must neither survive into clean_text nor inflate
    // n_kept (array_contains(acc, null) is SQL NULL -> would append)
    val docs = Seq((1L, Seq("a", null, null, "a", "b")))
      .toDF("doc_id", "segs")
    val out = Dedup
      .dedupSegmentsWithinDoc(docs, "doc_id", col("segs"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3))))
      .toMap
    out(1L) shouldBe (("a b", 2, 1)) // 3 non-null segs: a, a, b -> 1 dropped
  }
}
