package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Structural audit of a link graph BEFORE running the iterative scorers
  * ([[PageRank]], [[Hits]], [[Bfs]]): the in/out-degree distribution — is
  * it power-law shaped, how heavy is the hub tail (the skew the salted
  * joins must absorb), how many sinks (dangling mass for PageRank) and
  * sources (nodes nothing links to). Crawl pipelines read this histogram
  * to pick frontier caps and skew strategies; the same audit role P94's
  * length histogram plays for token counts.
  *
  * Bucket = number of binary digits of the degree (`length(bin(d))` —
  * EXACT integer log2+1, no float log; the [[CorpusStats.lengthHistogram]]
  * trick), so bucket k holds degrees 2^(k−1) ≤ d < 2^k and bucket 1
  * additionally holds the degree-0 nodes (sinks on the `out` side,
  * sources on the `in` side). Output: one row per (direction, bucket) —
  * `direction ∈ {out, in}`, `n_nodes`, `total_degree`, `min_degree`,
  * `max_degree` — all exact integers, hash-gateable.
  *
  * Scale posture: one edge-sized shuffle per direction for the degree
  * aggregation (partial-agg'd: a billion-link hub arrives as one row per
  * map partition), one distinct for the node set, a node-sized left join
  * to surface degree-0 nodes, and a ≤128-row bucket aggregate. Nothing
  * retained beyond node-sized intermediates.
  */
object GraphStats {

  def degreeReport(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    // r16: no Par.fan — per-row work is integer arithmetic, so the
    // bytes-proportional scan partitioning is already scale-adaptive and
    // the fan's round-robin exchange was pure overhead (guide §2.4).
    val e = Par.cached(
      edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst")))
    val nodes = Par.cached(
      e.select(col("__src").as("node"))
        .union(e.select(col("__dst").as("node")))
        .distinct())

    def side(endpoint: String, direction: String): DataFrame = {
      val deg = e
        .groupBy(col(endpoint).as("node"))
        .agg(count(lit(1)).as("__d"))
      nodes
        .join(deg, Seq("node"), "left")
        .select(
          lit(direction).as("direction"),
          coalesce(col("__d"), lit(0L)).cast(LongType).as("__d"))
    }

    side("__src", "out")
      .union(side("__dst", "in"))
      .groupBy(
        col("direction"),
        length(bin(col("__d"))).cast(IntegerType).as("bucket"))
      .agg(
        count(lit(1)).as("n_nodes"),
        sum(col("__d")).as("total_degree"),
        min(col("__d")).as("min_degree"),
        max(col("__d")).as("max_degree"))
  }

  /** Per-node triangle counts over the UNDIRECTED simple graph of
    * `edges` — the local-clustering signal web-graph spam detection and
    * community analysis read (link farms show anomalous triangle
    * density; genuine communities show high closure). Direction and
    * multiplicity are dropped (canonical `a < b` edges, distinct),
    * self-loops ignored. Output: `(node, n_triangles)` for every node
    * in at least one triangle; each triangle contributes once to each
    * of its three corners (global count = Σ/3).
    *
    * Scale posture: pure equi-joins, NO cartesian — and DEGREE-ORDERED
    * wedge enumeration (r14): every edge is oriented from its
    * lower-(degree, id) endpoint to its higher one, so the wedge pivot
    * of a triangle is always its degree-minimum corner. Out-degree
    * under this orientation is bounded by O(√m) on ANY graph (a node
    * can only point at neighbors of ≥ its own degree), so wedge volume
    * is Σ outdeg² = O(m^1.5) worst-case — a degree-10⁶ super-hub
    * contributes ~zero wedges as a pivot instead of the ~deg²/4 the
    * plain id-canonical orientation pays when the hub's id sorts low.
    * Each triangle {u,v,w} (u<v<w in degree-order) is emitted exactly
    * once: the wedge (v←u→w) closes against the oriented edge v→w.
    * Costs vs id-canonical: one node-sized degree aggregation and one
    * edge-sized degree join-back (both partial-agg'd / equi-joins) — a
    * constant factor that buys the skew bound.
    */
  def triangles(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    val canon = canonicalEdges(edges, srcCol, dstCol)
    trianglesOf(orientedEdges(canon, degreesOf(canon)))
  }

  /** Cached simple undirected edge set: canonical `a < b` pairs with
    * direction, multiplicity and self-loops dropped.
    */
  private def canonicalEdges(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame =
    // r16: no Par.fan (see degreeReport)
    Par.cached(
      edges
        .filter(col(srcCol) =!= col(dstCol))
        .select(
          least(col(srcCol), col(dstCol)).as("a"),
          greatest(col(srcCol), col(dstCol)).as("b"))
        .distinct())

  /** Cached per-node degree of the simple undirected graph (column
    * `degree`) — shared by the orientation and [[clusteringReport]].
    */
  private def degreesOf(canon: DataFrame): DataFrame =
    Par.cached(
      canon
        .select(explode(array(col("a"), col("b"))).as("node"))
        .groupBy(col("node"))
        .agg(count(lit(1)).as("degree")))

  /** Degree-ordered orientation of the canonical edge set: each edge
    * points from its lower-(degree, id) endpoint `u` to its higher one
    * `v`; `dv` carries deg(v) so wedge endpoints can be ordered without
    * another join. The struct comparison never ties — ids are distinct
    * within an edge. Cached: reused by both wedge sides AND the closure.
    */
  private def orientedEdges(canon: DataFrame, deg: DataFrame): DataFrame = {
    val keyed = canon
      .join(
        deg.select(col("node").as("a"), col("degree").as("__da")), Seq("a"))
      .join(
        deg.select(col("node").as("b"), col("degree").as("__db")), Seq("b"))
    val aFirst = struct(col("__da"), col("a")) < struct(col("__db"), col("b"))
    Par.cached(
      keyed.select(
        when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, col("b")).otherwise(col("a")).as("v"),
        when(aFirst, col("__db")).otherwise(col("__da")).as("dv")))
  }

  /** Wedge-enumerate + close over the degree-oriented edge set. The
    * pivot `u` of every emitted wedge is the degree-minimum corner;
    * endpoints are emitted in degree-order (`(dv,v) < (dw,w)`), so a
    * closing edge — if it exists — is oriented exactly `v → w` and one
    * equi-join on `(v, w)` finds it. Each triangle appears once.
    */
  private def trianglesOf(oriented: DataFrame): DataFrame = {
    val wedges = oriented.as("e1")
      .join(
        oriented.as("e2"),
        col("e1.u") === col("e2.u") &&
          struct(col("e1.dv"), col("e1.v")) <
            struct(col("e2.dv"), col("e2.v")))
      .select(
        col("e1.u").as("x"),
        col("e1.v").as("y"),
        col("e2.v").as("z"))
    val tris = wedges
      .join(
        oriented,
        wedges("y") === oriented("u") && wedges("z") === oriented("v"))
      .select(col("x"), col("y"), col("z"))
    tris
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Local clustering coefficient per node — `2·T(v) / (d(v)·(d(v)−1))`
    * over the simple undirected graph, as EXACT integer ppm
    * (`2·T·10⁶ intdiv d(d−1)`; no float division, hash-gateable). The
    * per-node closure number link-farm detection actually thresholds:
    * organic neighborhoods close (high cc), manufactured link stars
    * don't (hub cc ≈ 0 while degree is huge). Nodes with degree < 2
    * have no defined coefficient and report 0 over their 0 triangles.
    *
    * Scale posture: [[triangles]]' audited degree-ordered wedge/closure
    * joins; the degree aggregation is computed ONCE (cached) and shared
    * by the orientation and the coefficient — no new corpus-shaped
    * shuffle beyond a node-sized left join.
    */
  def clusteringReport(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    val canon = canonicalEdges(edges, srcCol, dstCol)
    val deg = degreesOf(canon)
    val tris = trianglesOf(orientedEdges(canon, deg))
    deg
      .join(tris, Seq("node"), "left_outer")
      .select(
        col("node"),
        col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(
          col("degree") >= 2L,
          // IntegralDivide, NOT `/` (which is DOUBLE division on longs):
          // exact floor quotient keeps the ppm hash-gateable
          org.apache.spark.sql.graft.ColumnShim.column(
            org.apache.spark.sql.catalyst.expressions.IntegralDivide(
              org.apache.spark.sql.graft.ColumnShim.expression(
                coalesce(col("n_triangles"), lit(0L)) * 2000000L),
              org.apache.spark.sql.graft.ColumnShim.expression(
                col("degree") * (col("degree") - 1L)))))
          .otherwise(lit(0L)).as("cc_ppm"))
  }
}
