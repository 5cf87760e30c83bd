package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DupSpansSpec extends SparkSpec {
  import spark.implicits._

  private def spans(docs: Seq[(Long, String)], k: Int, minDocs: Int = 2) =
    Dedup
      .duplicatedSpans(docs.toDF("doc_id", "text"), "doc_id", col("text"), k, minDocs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  private def removed(docs: Seq[(Long, String)], k: Int) =
    Dedup
      .removeDuplicatedSpans(docs.toDF("doc_id", "text"), "doc_id", col("text"), k)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("overlapping duplicated windows merge into one maximal span") {
    // docs 1 and 2 share the 4-word passage "p q r s" -> with k=2 the three
    // overlapping windows (p q)(q r)(r s) merge into ONE span per doc.
    val out = spans(Seq(
      1L -> "a b p q r s c",
      2L -> "p q r s z"), k = 2)
    out should contain((1L, 3L, 6L, 3L)) // words 3..6 of doc 1
    out should contain((2L, 1L, 4L, 3L)) // words 1..4 of doc 2
    // "a b", "s c", "s z" are unique -> no other spans
    out should have size 2
  }

  test("within-doc repetition alone is NOT duplicated (distinct-doc count)") {
    // "x y" repeats inside doc 1 only -> no span anywhere
    spans(Seq(1L -> "x y x y", 2L -> "m n"), k = 2) shouldBe empty
  }

  test("disjoint duplicated passages stay separate spans") {
    val out = spans(Seq(
      1L -> "p q GAP1 r s",
      2L -> "p q GAP2 r s"), k = 2)
    out shouldBe Set(
      (1L, 1L, 2L, 1L), (1L, 4L, 5L, 1L),
      (2L, 1L, 2L, 1L), (2L, 4L, 5L, 1L))
  }

  test("minDocs raises the duplication bar") {
    val docs = Seq(1L -> "p q", 2L -> "p q", 3L -> "p q", 4L -> "u v")
    spans(docs, k = 2, minDocs = 3).map(_._1) shouldBe Set(1L, 2L, 3L)
    spans(docs, k = 2, minDocs = 4) shouldBe empty
  }

  test("removal excises exactly the spanned words; untouched docs intact") {
    val out = removed(Seq(
      1L -> "a b p q r s c",
      2L -> "p q r s z",
      3L -> "unique words only here"), k = 2)
    out(1L) shouldBe (("a b c", 3L, 4L))
    out(2L) shouldBe (("z", 1L, 4L))
    out(3L) shouldBe (("unique words only here", 4L, 0L))
  }

  test("a fully-duplicated doc comes back empty; short docs untouched") {
    val out = removed(Seq(
      1L -> "p q r",
      2L -> "p q r",
      3L -> "x"), k = 2) // doc 3 is shorter than k: no windows
    out(1L) shouldBe (("", 0L, 3L))
    out(2L) shouldBe (("", 0L, 3L))
    out(3L) shouldBe (("x", 1L, 0L))
  }

  test("exact-collapse variant is result-identical to the plain one") {
    // mixed corpus: exact duplicate pairs (collapse bites), a cross-doc
    // shared passage between DISTINCT texts, within-doc-only repetition
    // (must stay non-duplicated), and a short doc
    val docs = Seq(
      1L -> "a b p q r s c",
      2L -> "p q r s z",
      3L -> "a b p q r s c",  // exact copy of 1
      4L -> "x y x y",        // within-doc repeat only
      5L -> "x",              // shorter than k
      6L -> "p q r s z")      // exact copy of 2
    def both(k: Int, minDocs: Int) = {
      val df = docs.toDF("doc_id", "text")
      val plain = Dedup.duplicatedSpans(df, "doc_id", col("text"), k, minDocs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val fast = Dedup.duplicatedSpansCollapsed(df, "doc_id", col("text"), k, minDocs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      (plain, fast)
    }
    for (minDocs <- Seq(2, 3)) {
      val (plain, fast) = both(2, minDocs)
      fast shouldBe plain
      plain should not be empty // the fixture must exercise something
    }
    // a single duplicated doc counts as 2 distinct docs in both variants
    val solo = Seq(1L -> "m n o", 2L -> "m n o").toDF("doc_id", "text")
    Dedup.duplicatedSpansCollapsed(solo, "doc_id", col("text"), 2)
      .count() shouldBe 2L
  }

  test("spans agree across input partitionings") {
    val docs = (1L to 40L).map { i =>
      i -> (if (i % 2 == 0) s"common passage here tail$i" else s"head$i common passage here")
    }
    val df1 = docs.toDF("doc_id", "text").repartition(1)
    val df7 = docs.toDF("doc_id", "text").repartition(7)
    def run(df: org.apache.spark.sql.DataFrame) =
      Dedup.duplicatedSpans(df, "doc_id", col("text"), 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    run(df1) shouldBe run(df7)
    run(df1).size shouldBe 40 // every doc carries the shared 3-word passage
  }
}
