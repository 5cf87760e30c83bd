package graft.ops

import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // every searchTopK persists its tf relation via Par.cached — release
  // them so the shared test session doesn't accumulate storage memory
  override def afterAll(): Unit = {
    Par.releaseCaches()
    super.afterAll()
  }

  private def run(
      docs: Seq[(Long, String)],
      query: Seq[String],
      k: Int = 10): Map[Long, (Long, Double, Int)] =
    Bm25
      .searchTopK(docs.toDF("doc_id", "text"), "doc_id", "text", query, k)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getInt(3))))
      .toMap

  test("rarer terms outscore common terms at equal tf and length") {
    // "rare" appears in 1 doc, "common" in 3 — equal tf and dl, so the
    // idf term decides
    val docs = Seq(
      1L -> "rare x y z",
      2L -> "common x y z",
      3L -> "common p q r",
      4L -> "common m n o")
    val out = run(docs, Seq("rare", "common"))
    out(1L)._2 should be > out(2L)._2
  }

  test("tf saturates: 5x the occurrences is far less than 5x the score") {
    val docs = Seq(
      1L -> "t a b c d e f g h i",           // tf=1, dl=10
      2L -> "t t t t t a b c d e")           // tf=5, dl=10
    val out = run(docs, Seq("t"))
    out(2L)._2 should be > out(1L)._2
    out(2L)._2 should be < out(1L)._2 * 3.0  // (k1+1)-bounded saturation
  }

  test("length normalization: same tf, longer doc scores lower") {
    val docs = Seq(
      1L -> "t a b",
      2L -> "t a b c d e f g h i j k l m n o p q r s")
    val out = run(docs, Seq("t"))
    out(1L)._2 should be > out(2L)._2
  }

  test("ranks are dense over the scored set; ties break by id; k caps") {
    val docs = Seq(
      1L -> "t x",
      2L -> "t x",
      3L -> "t x",
      4L -> "no match here")
    val out = run(docs, Seq("t"), k = 2)
    out.keySet shouldBe Set(1L, 2L)          // doc 4 unscored, k=2 cut
    out(1L)._3 shouldBe 1
    out(2L)._3 shouldBe 2
  }

  test("n_hits counts distinct matched query terms") {
    val docs = Seq(1L -> "a b c", 2L -> "a a a")
    val out = run(docs, Seq("a", "b", "zzz"))
    out(1L)._1 shouldBe 2L
    out(2L)._1 shouldBe 1L
  }

  test("score is a deterministic sorted fold (partitioning-invariant)") {
    val docs = (0L until 40L)
      .map(i => (i, s"spark join vector spark w$i x y z"))
    val a = run(docs, Seq("spark", "join", "vector"), k = 40)
    val b = Bm25
      .searchTopK(
        docs.toDF("doc_id", "text").repartition(7),
        "doc_id", "text", Seq("spark", "join", "vector"), 40)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getInt(3))))
      .toMap
    a shouldBe b
  }
}
