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

  test("empty benchmark flags nothing") {
    val corpus = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val bench = spark.emptyDataset[(Long, String)].toDF("doc_id", "text")
    Decontaminate
      .ngramOverlap(corpus, "doc_id", col("text"), bench, col("text"), n = 3)
      .count() shouldBe 0L
  }
}
