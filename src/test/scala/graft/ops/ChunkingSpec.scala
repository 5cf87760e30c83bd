package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def chunks(text: String, size: Int, overlap: Int): Seq[(Int, String, Int)] =
    Chunking
      .chunkWords(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", col("text"), size, overlap)
      .orderBy("chunk_idx")
      .collect()
      .map(r => (r.getInt(1), r.getString(2), r.getInt(3)))
      .toSeq

  test("doc shorter than one chunk yields a single short chunk") {
    chunks("a b c", 5, 2) shouldBe Seq((0, "a b c", 3))
  }

  test("doc of exactly chunkSize words yields one chunk") {
    chunks("a b c d e", 5, 2) shouldBe Seq((0, "a b c d e", 5))
  }

  test("overlapping windows stride by chunkSize - overlap") {
    // 8 words, size 5, overlap 2 -> stride 3: starts 0, 3 -> 2 chunks
    chunks("w0 w1 w2 w3 w4 w5 w6 w7", 5, 2) shouldBe Seq(
      (0, "w0 w1 w2 w3 w4", 5),
      (1, "w3 w4 w5 w6 w7", 5))
  }

  test("final partial chunk keeps the tail words") {
    // 9 words, size 5, stride 3: starts 0, 3, 6; last chunk 3 words
    chunks("w0 w1 w2 w3 w4 w5 w6 w7 w8", 5, 2) shouldBe Seq(
      (0, "w0 w1 w2 w3 w4", 5),
      (1, "w3 w4 w5 w6 w7", 5),
      (2, "w6 w7 w8", 3))
  }

  test("zero overlap produces disjoint cover; wordWindows agrees") {
    val got = chunks("w0 w1 w2 w3 w4 w5 w6", 3, 0)
    got shouldBe Seq((0, "w0 w1 w2", 3), (1, "w3 w4 w5", 3), (2, "w6", 1))
    val windows = Seq("w0 w1 w2 w3 w4 w5 w6")
      .toDF("text")
      .select(Chunking.wordWindows(col("text"), 3).as("w"))
      .collect()
      .head
      .getSeq[String](0)
    windows shouldBe got.map(_._2)
  }

  test("every word of the doc is covered; overlap words repeat") {
    val words = (0 until 23).map(i => s"w$i")
    val got = chunks(words.mkString(" "), 7, 3)
    // stride 4: 0,4,8,12,16 -> 5 chunks; coverage = all words
    got.map(_._1) shouldBe (0 until 5)
    got.flatMap(_._2.split(" ")).distinct.sorted shouldBe words.sorted
    // consecutive chunks share exactly `overlap` words (interior chunks)
    got.sliding(2).foreach { case Seq((_, a, _), (_, b, _)) =>
      a.split(" ").takeRight(3) shouldBe b.split(" ").take(3)
    }
  }

  test("invalid parameters are rejected") {
    an[IllegalArgumentException] should be thrownBy
      Chunking.wordWindows(col("text"), 0)
    an[IllegalArgumentException] should be thrownBy
      Chunking.wordWindows(col("text"), 5, 5)
  }
}
