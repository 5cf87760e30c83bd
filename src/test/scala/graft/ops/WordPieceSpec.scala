package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private val V = WordPiece.Frozen.toSet

  test("greedy longest-match-first, hand-checked") {
    // pos 0: 'theque'/'thequ'/'theq' miss, 'the' hits; then '##q',
    // '##ue', '##ry' — the continuation pieces force mid-word matches
    WordPiece.encodeWord("thequery", V).toSeq shouldBe
      Seq("the", "##q", "##ue", "##ry")
    WordPiece.encodeWord("query", V).toSeq shouldBe Seq("quer", "##y")
    WordPiece.encodeWord("sparks", V).toSeq shouldBe Seq("spark", "##s")
    WordPiece.encodeWord("window", V).toSeq shouldBe Seq("win", "##dow")
  }

  test("any dead-end position collapses the WHOLE word to [UNK]") {
    // 'x' matches as a head, but '##2' has no vocab entry — the prefix
    // already consumed must be discarded (BERT all-or-nothing)
    WordPiece.encodeWord("x2024", V).toSeq shouldBe Seq(WordPiece.Unk)
    WordPiece.encodeWord("2024", V).toSeq shouldBe Seq(WordPiece.Unk)
    WordPiece.encodeWord("can't", V).toSeq shouldBe Seq(WordPiece.Unk)
  }

  test("single chars always encode; empty word yields no pieces") {
    WordPiece.encodeWord("q", V).toSeq shouldBe Seq("q")
    WordPiece.encodeWord("", V).toSeq shouldBe Seq.empty
  }

  test("non-BMP input advances by codepoints, not UTF-16 units") {
    val astral = new String(Character.toChars(0x1F600)) // outside vocab
    WordPiece.encodeWord(s"a${astral}b", V).toSeq shouldBe Seq(WordPiece.Unk)
  }

  test("tokens flattens the document with bpeWords splitting") {
    val df = Seq((1L, "The Query 42")).toDF("id", "text")
    val out = df
      .select(WordPiece.tokens(col("text"), WordPiece.Frozen).as("t"))
      .collect().head.getSeq[String](0)
    out shouldBe Seq("the", "quer", "##y", WordPiece.Unk)
    df.select(WordPiece.tokenCount(col("text"), WordPiece.Frozen))
      .collect().head.getInt(0) shouldBe 4
  }

  test("wordPieces keeps word alignment and handles nulls") {
    val df = Seq((1L, "stream"), (2L, null.asInstanceOf[String]))
      .toDF("id", "w")
    val out = df
      .select(col("id"), WordPiece.wordPieces(col("w"), WordPiece.Frozen)
        .as("p"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
      .toMap
    out(1L) shouldBe Seq("stream")
    out(2L) shouldBe Seq.empty
  }
}
