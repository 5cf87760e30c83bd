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
    val e = Par.cached(
      Par.fan(edges).select(col(srcCol).as("__src"), col(dstCol).as("__dst")))
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
    * Scale posture: pure equi-joins, NO cartesian — wedges enumerate
    * each ordered triple `a<b<c` exactly once (canonical edges joined
    * on the shared middle vertex), then close against the canonical
    * edge set on `(a, c)`. Wedge volume is the Σ deg(b)² term every
    * distributed triangle algorithm pays; the canonical orientation
    * halves each degree, the standard mitigation short of full
    * degree-ordering (swap in when the graph has super-hubs — the
    * closure join is unchanged). The edge set is cached once and reused
    * by both wedge sides and the closure.
    */
  def triangles(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame =
    trianglesOf(canonicalEdges(edges, srcCol, dstCol))

  /** Cached simple undirected edge set: canonical `a < b` pairs with
    * direction, multiplicity and self-loops dropped.
    */
  private def canonicalEdges(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame =
    Par.cached(
      Par.fan(edges)
        .filter(col(srcCol) =!= col(dstCol))
        .select(
          least(col(srcCol), col(dstCol)).as("a"),
          greatest(col(srcCol), col(dstCol)).as("b"))
        .distinct())

  private def trianglesOf(canon: DataFrame): DataFrame = {
    val wedges = canon.as("e1")
      .join(canon.as("e2"), col("e1.b") === col("e2.a"))
      .select(
        col("e1.a").as("x"),
        col("e1.b").as("y"),
        col("e2.b").as("z"))
    val tris = wedges
      .join(
        canon,
        wedges("x") === canon("a") && wedges("z") === canon("b"))
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
    * Scale posture: [[triangles]]' audited wedge/closure joins plus one
    * degree aggregation over the SAME cached canonical edge set and a
    * node-sized left join — no new corpus-shaped shuffle.
    */
  def clusteringReport(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    val canon = canonicalEdges(edges, srcCol, dstCol)
    val deg = canon
      .select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("degree"))
    val tris = trianglesOf(canon)
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
