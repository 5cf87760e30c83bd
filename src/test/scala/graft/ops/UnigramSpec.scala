package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unigram-LM tokenizer (Kudo 2018, integer-cost formulation): training
  * provenance of the frozen vocab, Viterbi contract (cost-minimality,
  * total tie-break order, char fallback, codepoint positions), and the
  * column API's consistency with the scalar encoder.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("Frozen vocab is exactly train(documents@sf0.01) — provenance pin") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val trained =
      Unigram.train(docs, "text", Unigram.FrozenVocabSize)
    trained shouldBe Unigram.Frozen
  }

  test("segmentation concatenates back to the word (lossless)") {
    val words = Seq(
      "customer", "spark", "window", "stream", "the", "agg",
      "zebra", "qqq", "a", "tablequery", "bigdata")
    words.foreach { w =>
      Unigram.encodeWord(w, Unigram.Frozen).mkString shouldBe w
    }
  }

  test("whole-word pieces win over char paths; longer-than-6 words split") {
    Unigram.encodeWord("spark", Unigram.Frozen).toSeq shouldBe Seq("spark")
    Unigram.encodeWord("window", Unigram.Frozen).toSeq shouldBe Seq("window")
    // MaxPieceLen = 6: 'customer' must be a 2-piece segmentation
    Unigram.encodeWord("customer", Unigram.Frozen).toSeq shouldBe
      Seq("custom", "er")
  }

  test("out-of-vocabulary characters fall back to single-char pieces") {
    // 'z' never occurs in the training corpus: no vocab piece covers it,
    // so the UNK transition must carry it without losing neighbors
    val pieces = Unigram.encodeWord("zap", Unigram.Frozen)
    pieces.mkString shouldBe "zap"
    pieces.head shouldBe "z"
  }

  test("positions are codepoints: non-BMP chars are single pieces") {
    val word = "a\ud83d\ude00b" // a + U+1F600 + b
    val pieces = Unigram.encodeWord(word, Unigram.Frozen)
    pieces.length shouldBe 3
    pieces(1) shouldBe "\ud83d\ude00"
    pieces.mkString shouldBe word
  }

  test("Viterbi picks the minimum-cost segmentation with total tie-break") {
    // synthetic vocab: "ab"+"cd" (cost 2+2=4) beats "abc"+"d" (3+3=6) and
    // any char path (10 each)
    val v = Seq(
      ("a", 10), ("b", 10), ("c", 10), ("d", 10),
      ("ab", 2), ("cd", 2), ("abc", 3))
    Unigram.encodeWord("abcd", v).toSeq shouldBe Seq("ab", "cd")
    // exact tie in cost and token count -> lexicographically smaller path:
    // "ax"+"b" vs "a"+"xb" both cost 6/2 tokens; path "a<US>xb" < "ax<US>b"
    // because chr(31) sorts below any printable char
    val tie = Seq(("a", 3), ("b", 3), ("x", 99), ("ax", 3), ("xb", 3))
    Unigram.encodeWord("axb", tie).toSeq shouldBe Seq("a", "xb")
  }

  test("empty and null-ish inputs") {
    Unigram.encodeWord("", Unigram.Frozen) shouldBe empty
  }

  test("tokens column matches per-word scalar encode, in order") {
    val df = Seq(
      "the customer window  spark",
      "  ",
      "zap dup").toDF("text")
    val got = df
      .select(Unigram.tokens(col("text"), Unigram.Frozen).as("t"))
      .collect()
      .map(_.getSeq[String](0).toList)
    val expect = Seq("the customer window  spark", "  ", "zap dup").map {
      text =>
        text.trim.toLowerCase.split("[\\s]+").toList
          .filter(_.nonEmpty)
          .flatMap(w => Unigram.encodeWord(w, Unigram.Frozen))
    }
    got.toSeq shouldBe expect
  }

  test("trained costs are deterministic across two train() calls") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Unigram.train(docs, "text", 40)
    val b = Unigram.train(docs, "text", 40)
    a shouldBe b
    a.map(_._1).distinct.size shouldBe a.size // pieces unique
    all(a.map(_._2)) should be > 0 // no free pieces
  }
}
