package graft.ops

import graft.SparkSpec

/** [[Quantize.mutualTopPairs]]: ground-truth mutuality on a planted
  * fixture, hub exclusion, and partitioning invariance.
  */
class MutualNnSpec extends SparkSpec {
  import spark.implicits._

  // A-side: three "sentences"; B-side: four candidates.
  //   a1 <-> b1 : exact match (mutual)
  //   a2 <-> b2 : near match (mutual)
  //   a3 -> b2  : a3's best is b2, but b2's best is a2 -> NOT mutual
  //   b4        : hub-ish vector close to everything but nobody's best
  private val aRows = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f)),
    (2L, Seq(0.0f, 1.0f, 0.0f)),
    (3L, Seq(0.1f, 0.9f, 0.1f)))
  private val bRows = Seq(
    (11L, Seq(1.0f, 0.0f, 0.0f)),
    (12L, Seq(0.0f, 1.0f, 0.05f)),
    (13L, Seq(0.0f, 0.0f, 1.0f)),
    (14L, Seq(0.5f, 0.5f, 0.5f)))

  private def run(repart: Int = 0): Map[(Long, Long), Double] = {
    val a0 = aRows.toDF("id", "vec")
    val b0 = bRows.toDF("id", "vec")
    val (a, b) =
      if (repart > 0) (a0.repartition(repart), b0.repartition(repart))
      else (a0, b0)
    Quantize
      .mutualTopPairs(a, "id", "vec", b, "id", "vec")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3))
      .toMap
  }

  test("emits exactly the mutual top-1 pairs") {
    val got = run()
    got.keySet shouldBe Set((1L, 11L), (2L, 12L))
    got((1L, 11L)) shouldBe 1.0 +- 1e-9 // identical vectors
  }

  test("one-directional attraction is excluded (a3 -> b2 not mutual)") {
    // sanity: a3's single best IS b2 — so its absence above proves the
    // mutuality filter, not a scoring accident
    val topFromA3 = Quantize
      .quantizedTopK(
        bRows.toDF("id", "vec"), "id", "vec",
        aRows.filter(_._1 == 3L).toDF("id", "vec"), "id", "vec",
        k = 1)
      .collect()
    topFromA3.map(_.getLong(1)).toSeq shouldBe Seq(12L)
    run().keySet should not contain ((3L, 12L))
  }

  test("result is invariant under adversarial repartitioning") {
    run(repart = 5) shouldBe run()
  }
}
