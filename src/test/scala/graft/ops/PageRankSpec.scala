package graft.ops

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int = 5, parts: Int = 1) =
    PageRank
      .ranks(edges.toDF("src", "dst").repartition(parts), "src", "dst", iters)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

  test("the hub of a star graph gets the highest rank") {
    // 1, 2, 3 all link to 0; 0 links back to 1 so it has out-degree
    val out = run(Seq(1L -> 0L, 2L -> 0L, 3L -> 0L, 0L -> 1L))
    out(0L) should be > out(1L)
    out(1L) should be > out(2L) // 1 receives the hub's mass
    out(2L) shouldBe out(3L)    // symmetric leaves
  }

  test("ranks are exact integers: identical across partitionings and runs") {
    val edges = (0L until 200L).flatMap { i =>
      Seq(i -> ((i * 7 + 3) % 200), i -> ((i * 13 + 5) % 200))
    }
    val a = run(edges, parts = 1)
    a shouldBe run(edges, parts = 13)
    a shouldBe run(edges, parts = 13) // and run-to-run
  }

  test("total rank mass never exceeds the scale (dangling mass only leaks)") {
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 1L) // 4 in, nothing out? no: 4->1
    val out = run(edges)
    out.values.sum should be <= 1000000000000L
    out.values.foreach(_ should be > 0L)
  }

  private def runD(edges: Seq[(Long, Long)], iters: Int = 5, parts: Int = 1) =
    PageRank
      .ranks(
        edges.toDF("src", "dst").repartition(parts), "src", "dst", iters,
        redistributeDangling = true)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

  test("redistributeDangling conserves total mass up to floor rounding") {
    // node 3 is dangling (linked to, never links out) — the simplified
    // variant leaks its whole rank every iteration; redistribution keeps
    // the total within N·iters floor-roundings of the scale
    val edges = Seq(0L -> 1L, 1L -> 2L, 2L -> 3L, 0L -> 3L)
    val scale = 1000000000000L
    val drop = run(edges).values.sum
    val keep = runD(edges).values.sum
    keep should be > drop
    keep should be <= scale
    keep should be >= scale - 4L * 5L * 2L // n·iters roundings, generous
  }

  test("redistributeDangling stays exact across partitionings") {
    val edges = (0L until 150L).filter(_ % 3 != 0).flatMap { i =>
      Seq(i -> ((i * 7 + 3) % 150), i -> ((i * 13 + 5) % 150))
    }
    val a = runD(edges, parts = 1)
    a shouldBe runD(edges, parts = 11)
  }

  test("no dangling nodes => redistribution is a no-op") {
    val edges = Seq(0L -> 1L, 1L -> 2L, 2L -> 0L)
    run(edges) shouldBe runD(edges)
  }

  test("bad parameters are rejected") {
    val df = Seq((1L, 2L)).toDF("src", "dst")
    an[IllegalArgumentException] should be thrownBy
      PageRank.ranks(df, "src", "dst", iters = 0)
    an[IllegalArgumentException] should be thrownBy
      PageRank.ranks(df, "src", "dst", iters = 3, dampNum = 100, dampDen = 100)
  }

  private def runP(
      edges: Seq[(Long, Long)], seeds: Seq[Long], iters: Int = 5,
      parts: Int = 1) =
    PageRank
      .personalizedRanks(
        edges.toDF("src", "dst").repartition(parts),
        "src", "dst", seeds.toDF("node"), "node", iters)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

  test("trustrank: nodes unreachable from the seed set get rank 0") {
    // 0 -> 1 -> 2 is the trusted chain; 3 -> 4 is a disconnected farm
    // that plain PageRank would still pay teleport mass
    val out = runP(Seq(0L -> 1L, 1L -> 2L, 3L -> 4L), seeds = Seq(0L))
    out(0L) should be > 0L
    out(1L) should be > 0L
    out(2L) should be > 0L
    out(3L) shouldBe 0L
    out(4L) shouldBe 0L
    PageRank.ranks(
      Seq(0L -> 1L, 1L -> 2L, 3L -> 4L).toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      .apply(4L) should be > 0L // the contrast: global PR trusts the farm
  }

  test("trustrank with ALL nodes as seeds equals plain PageRank") {
    val edges = (0L until 100L).flatMap { i =>
      Seq(i -> ((i * 7 + 3) % 100), i -> ((i * 13 + 5) % 100))
    }
    runP(edges, seeds = (0L until 100L)) shouldBe run(edges)
  }

  test("trustrank is exact across partitionings") {
    val edges = (0L until 150L).flatMap { i =>
      Seq(i -> ((i * 7 + 3) % 150), i -> ((i * 13 + 5) % 150))
    }
    val seeds = (0L until 150L by 30L).toSeq
    runP(edges, seeds, parts = 1) shouldBe runP(edges, seeds, parts = 11)
  }

  test("trustrank rejects a seed set disjoint from the graph") {
    an[IllegalArgumentException] should be thrownBy
      runP(Seq(1L -> 2L), seeds = Seq(99L))
  }
}
