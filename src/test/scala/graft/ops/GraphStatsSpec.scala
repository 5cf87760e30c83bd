package graft.ops

import graft.SparkSpec

class GraphStatsSpec extends SparkSpec {
  import spark.implicits._

  private def report(edges: Seq[(Long, Long)], parts: Int = 1) =
    GraphStats
      .degreeReport(
        edges.toDF("src", "dst").repartition(parts), "src", "dst")
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap

  test("hand-checked buckets; degree-0 sinks and sources land in bucket 1") {
    // 1 -> 2, 1 -> 3, 2 -> 3: node 3 is a sink (out-deg 0), node 1 a
    // source (in-deg 0); out-degrees {1:2, 2:1, 3:0}, in mirrored
    val out = report(Seq(1L -> 2L, 1L -> 3L, 2L -> 3L))
    out(("out", 2)) shouldBe ((1L, 2L, 2L, 2L)) // node 1: degree 2
    out(("out", 1)) shouldBe ((2L, 1L, 0L, 1L)) // nodes 2 (1) and 3 (0)
    out(("in", 2)) shouldBe ((1L, 2L, 2L, 2L))  // node 3
    out(("in", 1)) shouldBe ((2L, 1L, 0L, 1L))  // nodes 1 (0) and 2 (1)
  }

  test("multi-edges count with multiplicity; totals equal the edge count") {
    val edges = Seq(1L -> 2L, 1L -> 2L, 1L -> 2L, 1L -> 2L) // bin(4) = 100
    val out = report(edges)
    out(("out", 3)) shouldBe ((1L, 4L, 4L, 4L))
    val totalOut = out.collect { case (("out", _), (_, t, _, _)) => t }.sum
    val totalIn = out.collect { case (("in", _), (_, t, _, _)) => t }.sum
    totalOut shouldBe edges.size.toLong
    totalIn shouldBe edges.size.toLong
  }

  test("deterministic across partitionings") {
    val edges = (0L until 300L).flatMap { i =>
      Seq(i -> ((i * 7 + 3) % 300), i -> (i % 17))
    }
    report(edges, parts = 1) shouldBe report(edges, parts = 13)
  }

  private def tris(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    GraphStats.triangles(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("ring-with-chords has exactly n triangles, 3 per node") {
    // nodes 0..n-1; edges (i, i+1) and (i, i+2) mod n -> triangles are
    // exactly the consecutive triples {i, i+1, i+2}
    val n = 24L
    val edges = (0L until n).flatMap(i => Seq(i -> ((i + 1) % n), i -> ((i + 2) % n)))
    val t = tris(edges)
    t.values.sum shouldBe 3 * n // each triangle credits 3 corners
    t.size shouldBe n
    all(t.values) shouldBe 3L
  }

  test("triangle-free graphs report nothing; direction and dups ignored") {
    // a 4-cycle has no triangle
    tris(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L)) shouldBe empty
    // one triangle however oriented/duplicated/self-looped
    val messy = Seq(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 1L, 1L -> 1L, 2L -> 3L)
    tris(messy) shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L)
  }

  test("K4: every node sits in 3 of the 4 triangles") {
    val k4 = for {
      a <- 0L to 3L; b <- 0L to 3L if a < b
    } yield a -> b
    val t = tris(k4)
    t.values.sum shouldBe 12L // 4 triangles x 3 corners
    all(t.values) shouldBe 3L
  }

  test("hub graph: degree-ordered counts match the closed form") {
    // star hub (mid-sorting id h — the id-canonical wedge worst case:
    // its edges split across both sides of an a<b orientation) + a ring
    // over the leaves: triangles are exactly {h, i, i+1 mod m}
    val m = 40L
    val leaves = (0L until m).map(i => if (i < m / 2) i else i + 30000L)
    val hub = 15000L // strictly between the two leaf id blocks
    val edges =
      leaves.map(l => hub -> l) ++
        (0L until m).map(i => leaves(i.toInt) -> leaves(((i + 1) % m).toInt))
    val t = tris(edges)
    t(hub) shouldBe m // one triangle per ring edge
    leaves.foreach(l => t(l) shouldBe 2L) // its two ring neighbors
    val c = cc(edges)
    // hub: deg m, m triangles -> 2*m*1e6 / (m*(m-1)) = 2e6/(m-1) floored
    c(hub) shouldBe ((m, m, 2000000L / (m - 1)))
    // leaf: deg 3 (hub + 2 ring), 2 triangles -> 4e6/6 floored
    leaves.foreach(l => c(l) shouldBe ((3L, 2L, 666666L)))
  }

  private def cc(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    GraphStats.clusteringReport(edges.toDF("src", "dst"), "src", "dst")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("clustering: K4 fully closed (cc = 1e6), path open (cc = 0)") {
    val k4 = for { a <- 0L to 3L; b <- 0L to 3L if a < b } yield a -> b
    val ck4 = cc(k4)
    all(ck4.values.map(_._3)) shouldBe 1000000L
    // path 1-2-3: middle node has degree 2, zero triangles -> cc 0;
    // endpoints have degree 1 -> undefined, reported 0
    val cp = cc(Seq(1L -> 2L, 2L -> 3L))
    cp(2L) shouldBe ((2L, 0L, 0L))
    cp(1L) shouldBe ((1L, 0L, 0L))
  }

  test("clustering: ring-with-chords nodes close half their wedges") {
    // degree 4, 3 triangles each: cc = 2*3*1e6 / (4*3) = 500000 exactly
    val n = 12L
    val edges = (0L until n).flatMap(i =>
      Seq(i -> ((i + 1) % n), i -> ((i + 2) % n)))
    val out = cc(edges)
    out.size shouldBe n
    all(out.values) shouldBe ((4L, 3L, 500000L))
  }
}
