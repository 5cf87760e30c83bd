package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Bfs.depths]]: ground-truth layers on a hand-built graph, cycle
  * safety, multi-seed min semantics, early exit, and partitioning
  * invariance.
  */
class BfsSpec extends SparkSpec {
  import spark.implicits._

  //   1 -> 2 -> 3 -> 4 -> 5 (chain)
  //   1 -> 3 (shortcut: 3 is depth 1, not 2)
  //   5 -> 1 (cycle back to the seed)
  //   6 -> 7 (disconnected from seed 1)
  private val edges = Seq(
    1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 1L -> 3L, 5L -> 1L, 6L -> 7L)
    .toDF("src", "dst")

  private def run(
      seeds: Seq[Long],
      maxDepth: Int,
      repart: Int = 0): Map[Long, Int] = {
    val e = if (repart > 0) edges.repartition(repart) else edges
    Bfs
      .depths(e, "src", "dst", seeds.toDF("node"), "node", maxDepth)
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .toMap
  }

  test("single-seed layers with a shortcut and a cycle") {
    run(Seq(1L), 10) shouldBe
      Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 3)
  }

  test("maxDepth truncates layers") {
    run(Seq(1L), 1) shouldBe Map(1L -> 0, 2L -> 1, 3L -> 1)
    run(Seq(1L), 0) shouldBe Map(1L -> 0)
  }

  test("multi-seed takes the minimum hop count") {
    run(Seq(1L, 4L), 10) shouldBe
      Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 0, 5L -> 1)
  }

  test("disconnected components are reached only from their own seeds") {
    run(Seq(6L), 10) shouldBe Map(6L -> 0, 7L -> 1)
  }

  test("early exit: exhausted frontier stops before maxDepth") {
    // depth 64 allowed; the graph exhausts at depth 3 — this passing
    // quickly (not 64 rounds) is itself the early-exit evidence
    run(Seq(1L), 64) shouldBe
      Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 3)
  }

  test("result is invariant under adversarial repartitioning") {
    run(Seq(1L, 6L), 10, repart = 5) shouldBe run(Seq(1L, 6L), 10)
  }

  test("seed predicate convenience matches explicit seeds") {
    val viaPred = Bfs
      .depthsFrom(edges, "src", "dst", col("src") === 1L, 10)
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .toMap
    viaPred shouldBe run(Seq(1L), 10)
  }
}
