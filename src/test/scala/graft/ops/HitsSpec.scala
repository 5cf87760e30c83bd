package graft.ops

import graft.SparkSpec

class HitsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int = 5, parts: Int = 1) =
    Hits
      .ranks(edges.toDF("src", "dst").repartition(parts), "src", "dst", iters)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("a star's centre is the authority; the pointers are hubs") {
    // 1, 2, 3 all link to 0 and to nothing else
    val out = run(Seq(1L -> 0L, 2L -> 0L, 3L -> 0L))
    out(0L)._2 should be > out(1L)._2 // centre = top authority
    out(1L)._1 should be > out(0L)._1 // leaves = hubs
    out(1L) shouldBe out(2L)          // symmetric leaves
    out(1L) shouldBe out(3L)
    out(0L)._1 shouldBe 0L            // centre links to nothing: zero hub
    out(1L)._2 shouldBe 0L            // leaves unlinked-to: zero authority
  }

  test("a directory page pointing at the best authorities is the top hub") {
    // 10 points at BOTH popular pages 0 and 1; 11..13 point only at 0
    val out = run(
      Seq(10L -> 0L, 10L -> 1L, 11L -> 0L, 12L -> 0L, 13L -> 0L, 11L -> 1L))
    out(10L)._1 should be >= out(12L)._1
    out(0L)._2 should be > out(1L)._2 // 0 has more in-links from hubs
  }

  test("scores are exact integers: identical across partitionings and runs") {
    val edges = (0L until 200L).flatMap { i =>
      Seq(i -> ((i * 7 + 3) % 200), i -> ((i * 13 + 5) % 200))
    }
    val a = run(edges, parts = 1)
    a shouldBe run(edges, parts = 13)
    a shouldBe run(edges, parts = 13) // and run-to-run
  }

  test("rescale pins the max of each side into [scale, 2*scale)") {
    val edges = (0L until 100L).flatMap { i =>
      Seq(i -> ((i * 7 + 3) % 100), i -> ((i * 13 + 5) % 100))
    }
    val out = run(edges)
    val maxHub = out.values.map(_._1).max
    val maxAuth = out.values.map(_._2).max
    maxHub should be >= 1000000L
    maxHub should be < 2000000L
    maxAuth should be >= 1000000L
    maxAuth should be < 2000000L
  }

  test("bad parameters are rejected") {
    val df = Seq((1L, 2L)).toDF("src", "dst")
    an[IllegalArgumentException] should be thrownBy
      Hits.ranks(df, "src", "dst", iters = 0)
    an[IllegalArgumentException] should be thrownBy
      Hits.ranks(df, "src", "dst", iters = 3, scale = 10L)
  }
}
