package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("flags docs sharing a trigram with the benchmark, counts distinct shared grams") {
    val corpus = Seq(
      // shares "alpha beta gamma" and "beta gamma delta" with bench doc 100
      (1L, "alpha beta gamma delta"),
      // shares nothing
      (2L, "totally different words here"),
      // shares "alpha beta gamma" only, repeated — still ONE distinct gram
      (3L, "alpha beta gamma zzz alpha beta gamma")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon")
    ).toDF("doc_id", "text")

    val out = Decontaminate
      .ngramOverlap(corpus, "doc_id", col("text"), bench, col("text"), n = 3)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

    out shouldBe Map(1L -> 2L, 3L -> 1L)
  }

  test("shuffle-fallback join matches the broadcast path") {
    val corpus = (0L until 50L)
      .map(i => (i, s"w$i w${i + 1} w${i + 2} w${i + 3}"))
      .toDF("doc_id", "text")
    val bench = Seq((999L, "w10 w11 w12 w13 w14")).toDF("doc_id", "text")
    val a = Decontaminate
      .ngramOverlap(corpus, "doc_id", col("text"), bench, col("text"), n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = Decontaminate
      .ngramOverlap(corpus, "doc_id", col("text"), bench, col("text"), n = 3,
        broadcastBenchmark = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    a should not be empty
    a shouldBe b
  }

  test("n=8 production sweep: sparse shingles, exact contaminated fraction") {
    val leaked = "q1 q2 q3 q4 q5 q6 q7 q8 q9"
    val corpus = Seq(
      // contains the 9-word benchmark passage verbatim → two distinct
      // 8-grams leak into a 12-word doc (5 distinct 8-grams total)
      (1L, s"intro words here $leaked"),
      // shares a 7-gram only — NOT flagged at n=8
      (2L, "q1 q2 q3 q4 q5 q6 q7 different tail words"),
      (3L, "completely clean document with many harmless words in it")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, leaked)).toDF("doc_id", "text")

    val out = Decontaminate
      .ngramOverlap(corpus, "doc_id", col("text"), bench, col("text"), n = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

    out shouldBe Array((1L, 2L, 5L, 0.4))
  }

  test("noveltyReport covers EVERY doc: dup 0, fresh 1e6, partial in between") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),          // exact dup of ref -> 0
      (2L, "totally different words here now"), // nothing shared -> 1e6
      (3L, "alpha beta gamma zzz yyy xxx"),     // 1 of 4 grams seen
      (4L, "ab")                                // no 3-grams -> 0 (nothing novel)
    ).toDF("doc_id", "text")
    val ref = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val out = Decontaminate
      .noveltyReport(corpus, "doc_id", col("text"), ref, col("text"), n = 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    out.keySet shouldBe Set(1L, 2L, 3L, 4L) // total coverage
    out(1L) shouldBe ((2L, 2L, 0L))
    out(2L) shouldBe ((3L, 0L, 1000000L))
    out(3L) shouldBe ((4L, 1L, 750000L))
    out(4L) shouldBe ((0L, 0L, 0L))
  }

  test("dropContaminated anti-joins flagged docs in one call") {
    val leaked = "e1 e2 e3 e4 e5 e6 e7 e8"
    val corpus = Seq(
      (1L, s"prefix $leaked suffix"),
      (2L, "clean as can be with other words entirely"),
      (3L, s"$leaked")
    ).toDF("doc_id", "text")
    val bench = Seq((9L, leaked)).toDF("doc_id", "text")

    val clean = Decontaminate
      .dropContaminated(corpus, "doc_id", col("text"), bench, col("text"), n = 8)
    clean.select("doc_id").as[Long].collect().sorted shouldBe Array(2L)
    // a loose threshold keeps docs under the fraction
    val loose = Decontaminate.dropContaminated(
      corpus, "doc_id", col("text"), bench, col("text"), n = 8, maxFrac = 0.9)
    // doc 3 is 100% contaminated (its only 8-gram IS the benchmark) and
    // drops; doc 1 is 1/3 contaminated and survives at maxFrac=0.9
    loose.select("doc_id").as[Long].collect().sorted shouldBe Array(1L, 2L)
  }

  test("empty benchmark flags nothing") {
    val corpus = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val bench = spark.emptyDataset[(Long, String)].toDF("doc_id", "text")
    Decontaminate
      .ngramOverlap(corpus, "doc_id", col("text"), bench, col("text"), n = 3)
      .count() shouldBe 0L
  }

  test("leakReport: per-item distinct doc counts and gram coverage") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),   // covers 2 grams of item 100
      (2L, "alpha beta gamma zzz"),     // covers 1 gram of item 100
      (3L, "nothing shared at all")
    ).toDF("doc_id", "text")
    val bench = Seq(
      // grams: "alpha beta gamma", "beta gamma delta", "gamma delta EPS"
      (100L, "alpha beta gamma delta EPS"),
      (200L, "never seen anywhere sorry")
    ).toDF("doc_id", "text")
    val out = Decontaminate
      .leakReport(corpus, "doc_id", col("text"), bench, "doc_id", col("text"), n = 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // item 200 leaks nowhere -> absent; item 100: docs 1+2 leak, grams
    // "alpha beta gamma" + "beta gamma delta" covered of its 3
    out.keySet shouldBe Set(100L)
    out(100L)._1 shouldBe 2L
    out(100L)._2 shouldBe 2L
    out(100L)._3 shouldBe 3L
    out(100L)._4 shouldBe (2.0 / 3.0)
  }

  test("leakReport: fully-reconstructible item reports leaked_frac 1.0") {
    val corpus = Seq((1L, "q w e r t")).toDF("doc_id", "text")
    val bench = Seq((9L, "q w e r")).toDF("doc_id", "text")
    val out = Decontaminate
      .leakReport(corpus, "doc_id", col("text"), bench, "doc_id", col("text"), n = 3)
      .collect()
    out.length shouldBe 1
    out.head.getDouble(4) shouldBe 1.0
  }

  test("semanticOverlap flags aligned vectors, counts hits, min bench id") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),   // aligned with both bench vectors
      (2L, Array(0.0f, 1.0f)),   // orthogonal -> clean
      (3L, Array(-1.0f, 0.0f)),  // anti-aligned -> clean (dot <= 0)
      (4L, Array(0.0f, 0.0f)))   // zero vector -> never flagged
      .toDF("vec_id", "embedding")
    val bench = Seq(
      (90L, Array(1.0f, 0.05f)),
      (80L, Array(1.0f, -0.05f)))
      .toDF("vec_id", "embedding")
    val out = Decontaminate
      .semanticOverlap(corpus, "vec_id", "embedding",
        bench, "vec_id", "embedding", 1, 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    out.keySet shouldBe Set(1L)
    out(1L) shouldBe ((2L, 80L)) // both bench vectors hit; min id reported
  }

  test("semanticOverlap threshold is inclusive (cos == num/den is a hit)") {
    // identical vectors: cos exactly 1 -> hit at threshold 1/1
    val corpus = Seq((1L, Array(3.0f, 4.0f))).toDF("vec_id", "embedding")
    val bench = Seq((9L, Array(3.0f, 4.0f))).toDF("vec_id", "embedding")
    Decontaminate
      .semanticOverlap(corpus, "vec_id", "embedding",
        bench, "vec_id", "embedding", 1, 1)
      .count() shouldBe 1L
  }

  test("dropSemanticContaminated removes exactly the flagged rows") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val bench = Seq((9L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val kept = Decontaminate
      .dropSemanticContaminated(corpus, "vec_id", "embedding",
        bench, "vec_id", "embedding", 1, 2)
      .collect().map(_.getLong(0)).toSet
    kept shouldBe Set(2L)
  }
}
