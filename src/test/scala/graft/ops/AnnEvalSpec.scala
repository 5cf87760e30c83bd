package graft.ops

import graft.SparkSpec

/** [[AnnEval.recallAtK]]: hand-computed hits, missed-query zeroes. */
class AnnEvalSpec extends SparkSpec {
  import spark.implicits._

  test("per-query recall counts hits against truth, zero for missed queries") {
    val truth = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 20L), (2L, 21L),
      (3L, 30L)).toDF("query_id", "neighbor_id")
    val ann = Seq(
      (1L, 10L), (1L, 12L), (1L, 99L), // 2 of 3
      (2L, 20L), (2L, 21L) // 2 of 2; query 3 entirely missed
    ).toDF("query_id", "neighbor_id")
    val got = AnnEval.recallAtK(ann, truth, "query_id", "neighbor_id")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    got(1L) shouldBe ((3L, 2L, 666666L))
    got(2L) shouldBe ((2L, 2L, 1000000L))
    got(3L) shouldBe ((1L, 0L, 0L))
    got.size shouldBe 3
  }

  test("ann results for queries outside truth are ignored") {
    val truth = Seq((1L, 10L)).toDF("query_id", "neighbor_id")
    val ann = Seq((9L, 10L)).toDF("query_id", "neighbor_id")
    val got = AnnEval.recallAtK(ann, truth, "query_id", "neighbor_id").collect()
    got.map(_.getLong(0)).toSeq shouldBe Seq(1L)
    got(0).getLong(2) shouldBe 0L
  }
}
