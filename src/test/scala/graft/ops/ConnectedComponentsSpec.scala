package graft.ops

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], parts: Int = 1): Map[Long, Long] =
    ConnectedComponents
      .components(edges.toDF("id_a", "id_b").repartition(parts))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

  /** Brute-force union-find ground truth: node -> component min. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("a long chain converges in O(log n) rounds, not O(n)") {
    // 400-node chain: label propagation needs ~400 rounds; star
    // contraction's maxRounds=30 suffices only because it's logarithmic
    val chain = (0L until 399L).map(i => i -> (i + 1))
    val out = run(chain)
    out.size shouldBe 400
    out.values.toSet shouldBe Set(0L)
  }

  test("matches brute-force union-find on an irregular multi-component graph") {
    val edges = (0L until 500L).flatMap { i =>
      val e1 = if (i % 7 != 0) Seq(i -> ((i * 31 + 7) % 200)) else Nil
      val e2 = if (i % 13 == 0) Seq(i -> (i + 300)) else Nil
      e1 ++ e2
    }
    run(edges) shouldBe unionFind(edges)
  }

  test("interchangeable with nearDupClusters on a clique-ish pair graph") {
    val edges = Seq(
      1L -> 2L, 2L -> 3L, 1L -> 3L, // clique {1,2,3}
      10L -> 11L,                   // pair
      20L -> 21L, 21L -> 22L)       // path
    val lp = Dedup
      .nearDupClusters(edges.toDF("id_a", "id_b"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    run(edges) shouldBe lp
  }

  test("deterministic across partitionings; self-loops ignored") {
    val edges = (0L until 300L).map(i => i -> ((i * 17 + 5) % 300))
    val a = run(edges, parts = 1)
    a shouldBe run(edges, parts = 13)
    a shouldBe unionFind(edges.filter(e => e._1 != e._2))
  }
}
