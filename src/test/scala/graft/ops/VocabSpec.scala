package graft.ops

import graft.SparkSpec

/** [[Vocab]]: hand-computed vocabulary ranking/coverage and PMI ratios. */
class VocabSpec extends SparkSpec {
  import spark.implicits._

  test("vocabulary ranks by (count desc, token asc) with cumulative coverage") {
    val docs = Seq(
      "a b b c c c",
      "c d a",
      "e").toDF("text")
    // counts: a=2 b=2 c=4 d=1 e=1
    val got = Vocab.vocabulary(docs, "text", minCount = 2L, topV = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    got shouldBe Array(("c", 4L, 1, 4L), ("a", 2L, 2, 6L))
  }

  test("vocabulary minCount drops hapaxes before ranking") {
    val docs = Seq("x y y").toDF("text")
    val got = Vocab.vocabulary(docs, "text", minCount = 2L, topV = 10)
      .collect().map(_.getString(0))
    got shouldBe Array("y")
  }

  test("pmi ratio is the exact integer c_xy*N*1e6/(c_x*c_y)") {
    // corpus: "a b a b c" -> N=5; uni: a=2 b=2 c=1
    // bigrams: "a b"=2, "b a"=1, "b c"=1
    val docs = Seq("a b a b c").toDF("text")
    val got = Vocab.pmiBigrams(docs, "text", minCount = 1L, topP = 10)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getInt(6))))
      .toMap
    // a b: 2*5*1e6/(2*2) = 2_500_000 ; b a: 1*5*1e6/4 = 1_250_000
    // b c: 1*5*1e6/(2*1) = 2_500_000
    got(("a", "b")) shouldBe ((2L, 2L, 2L, 2500000L, 1))
    got(("b", "c")) shouldBe ((1L, 2L, 1L, 2500000L, 2))
    got(("b", "a")) shouldBe ((1L, 2L, 2L, 1250000L, 3))
  }

  test("pmi is partitioning-invariant (exact integers)") {
    val docs = (1 to 50).map(i => s"w$i common pair common pair").toDF("text")
    val a = Vocab.pmiBigrams(docs, "text", minCount = 5L, topP = 20)
      .collect().map(_.toString).sorted
    val b = Vocab.pmiBigrams(docs.repartition(7), "text", minCount = 5L, topP = 20)
      .collect().map(_.toString).sorted
    a shouldBe b
  }
}
