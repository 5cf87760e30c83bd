package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class RankFusionSpec extends SparkSpec {
  import spark.implicits._

  private def lists(xs: Seq[(Long, Int)]*): Seq[DataFrame] =
    xs.map(_.toDF("doc_id", "rank"))

  private def run(ls: Seq[DataFrame], topK: Int = 100) =
    RankFusion
      .rrf(ls, "doc_id", "rank", topK = topK)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))

  test("hand-computed fusion: shared doc outranks either single-list doc") {
    // contributions: rank 1 → 1e6 div 61 = 16393, rank 2 → 1e6 div 62 = 16129
    val out = run(lists(Seq(1L -> 1, 2L -> 2), Seq(2L -> 1, 3L -> 2)))
    out shouldBe Array(
      (2L, 2L, 32522L, 1),  // 16393 + 16129
      (1L, 1L, 16393L, 2),
      (3L, 1L, 16129L, 3))
  }

  test("k0 damping: one list's #1 does not beat presence in both lists") {
    // doc 9 is #1 in list A only; doc 5 is mid-rank in both
    val out = run(lists(
      Seq(9L -> 1, 5L -> 10),
      Seq(5L -> 10, 7L -> 1)))
    val byId = out.map(r => r._1 -> r._4).toMap
    byId(5L) shouldBe 1 // 2 × (1e6 div 70) = 28570 > 16393
  }

  test("topK caps the output and ranks stay dense; ties break by id") {
    val out = run(lists(Seq(1L -> 1, 2L -> 1, 3L -> 1)), topK = 2)
    // identical scores → id ascending
    out.map(_._1) shouldBe Array(1L, 2L)
    out.map(_._4) shouldBe Array(1, 2)
  }

  test("result is invariant to input partitioning") {
    val a = (1 to 50).map(i => (i.toLong, i))
    val b = (1 to 50).map(i => (i.toLong, 51 - i))
    val base = run(lists(a, b))
    val shuffled = run(
      Seq(a.toDF("doc_id", "rank").repartition(7),
        b.toDF("doc_id", "rank").repartition(3)))
    shuffled shouldBe base
  }
}
