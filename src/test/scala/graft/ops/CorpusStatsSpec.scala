package graft.ops

import graft.SparkSpec

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("per-group counts, token/char sums, distinct texts, max and mean") {
    val docs = Seq(
      (1L, "a b c", "en", "web"),   // 3 tokens, 5 chars
      (2L, "a b c", "en", "web"),   // exact dup of doc 1
      (3L, "d e", "en", "web"),     // 2 tokens, 3 chars
      (4L, "x", "de", "web")        // 1 token, 1 char
    ).toDF("doc_id", "text", "lang", "source")
    val out = CorpusStats
      .corpusReport(docs, "text", Seq("lang", "source"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getDouble(7))))
      .toMap
    out(("en", "web")) shouldBe ((3L, 8L, 13L, 2L, 3L, 8.0 / 3.0))
    out(("de", "web")) shouldBe ((1L, 1L, 1L, 1L, 1L, 1.0))
  }

  test("null and empty texts count as documents with zero chars") {
    val docs = Seq((1L, Some(""), "en"), (2L, None: Option[String], "en"))
      .toDF("doc_id", "text", "lang")
    val r = CorpusStats.corpusReport(docs, "text", Seq("lang")).head()
    r.getLong(1) shouldBe 2L // n_docs
    r.getLong(3) shouldBe 0L // n_chars
    r.getLong(4) shouldBe 1L // "" and null hash identically (both → "")
  }

  test("report is invariant to input partitioning (integer aggregates)") {
    val docs = (1 to 100)
      .map(i => (i.toLong, s"tok${i % 7} " * (i % 5 + 1), s"l${i % 3}"))
      .toDF("doc_id", "text", "lang")
    def run(parts: Int) =
      CorpusStats
        .corpusReport(docs.repartition(parts), "text", Seq("lang"))
        .collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
    run(1) shouldBe run(16)
  }
}
