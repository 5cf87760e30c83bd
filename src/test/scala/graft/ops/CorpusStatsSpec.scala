package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

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

  test("corpusDrift ranks tokens by exact relative-rate divergence") {
    // A: 4 tokens total — x x x y ; B: 4 tokens total — x y y z
    // rates ppm: x 750000/250000 (Δ500000), y 250000/500000 (Δ250000),
    // z 0/250000 (Δ250000) — y before z on the token tie-break
    val a = Seq((1L, "x x x y")).toDF("doc_id", "text")
    val b = Seq((2L, "x y y z")).toDF("doc_id", "text")
    val out = CorpusStats.corpusDrift(a, b, "text", k = 10)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    out.toSeq shouldBe Seq(
      ("x", 3L, 1L, 750000L, 250000L, 500000L),
      ("y", 1L, 2L, 250000L, 500000L, 250000L),
      ("z", 0L, 1L, 0L, 250000L, 250000L))
    // k caps the report; ordering is deterministic across partitionings
    CorpusStats.corpusDrift(a.repartition(7), b.repartition(3), "text", 2)
      .collect().map(_.getString(0)).toSeq shouldBe Seq("x", "y")
  }
}
