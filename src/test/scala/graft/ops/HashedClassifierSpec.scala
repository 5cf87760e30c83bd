package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HashedClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64

  /** The slot a literal token hashes to (evaluated through the same
    * expression the operator uses).
    */
  private def slotOf(token: String): Long =
    spark.range(1)
      .select(HashedClassifier.bucket(lit(token), B))
      .head().getLong(0)

  private def score(
      docs: Seq[(Long, String)],
      weights: Seq[(Long, Long)],
      bias: Long = 0L,
      threshold: Long = 0L) =
    HashedClassifier
      .scoreDocs(
        docs.toDF("doc_id", "text"),
        "doc_id",
        "text",
        weights.toDF("bucket", "weight_micro"),
        buckets = B,
        biasMicro = bias,
        thresholdMicro = threshold)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap

  test("score = bias + sum of hashed-slot weights; threshold decides keep") {
    val (sa, sb) = (slotOf("good"), slotOf("bad"))
    assume(sa != sb) // 64 slots, 2 tokens — holds for these literals
    val out = score(
      Seq(1L -> "good good bad", 2L -> "bad"),
      Seq(sa -> 100L, sb -> -40L),
      bias = 10L,
      threshold = 0L)
    out(1L) shouldBe ((3L, 170L, true))   // 2·100 − 40 + 10
    out(2L) shouldBe ((1L, -30L, false))  // −40 + 10
  }

  test("tokens hashing to unlisted slots contribute zero (pruned model)") {
    val out = score(Seq(1L -> "unknown tokens only"), Seq.empty, bias = 7L)
    out(1L) shouldBe ((3L, 7L, true))
  }

  test("empty and null docs emit a row scoring bias alone") {
    val docs = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
      .unionAll(Seq(Tuple1(3L)).toDF("doc_id").select(
        col("doc_id"), lit(null).cast("string").as("text")))
    val out = HashedClassifier
      .scoreDocs(docs, "doc_id", "text",
        Seq((0L, 5L)).toDF("bucket", "weight_micro"), B, biasMicro = -3L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    out(1L) shouldBe ((0L, -3L))
    out(2L) shouldBe ((0L, -3L))
    out(3L) shouldBe ((0L, -3L))
  }

  test("pseudo weights are deterministic, dense and amplitude-bounded") {
    val w = HashedClassifier.pseudoWeights(spark, 128, amp = 500L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    w.size shouldBe 128
    all(w.values) should (be >= -500L and be <= 500L)
    val again = HashedClassifier.pseudoWeights(spark, 128, amp = 500L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    again shouldBe w
  }

  test("scores are invariant to input partitioning (integer sums)") {
    val docs = (1 to 40).map(i =>
      (i.toLong, Seq.fill(i % 7 + 1)(s"tok${i % 11}").mkString(" ")))
    val w = HashedClassifier.pseudoWeights(spark, B)
    def run(parts: Int) =
      HashedClassifier
        .scoreDocs(docs.toDF("doc_id", "text").repartition(parts),
          "doc_id", "text", w, B)
        .collect()
        .map(r => r.getLong(0) -> r.getLong(2))
        .toMap
    run(1) shouldBe run(8)
  }
}
