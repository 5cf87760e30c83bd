package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Breadth-first min-hop distances over a directed link graph — the crawl
  * frontier scheduler's core question ("how many hops from the seed list
  * is this URL?"), also link-distance freshness scoring and
  * seed-proximity corpus weighting (closer-to-seeds pages are
  * higher-trust in classic crawl curation).
  *
  * Exact BFS layers: `depth(v) = min hops from any seed`, emitted for
  * every node reachable within `maxDepth`; unreachable nodes are absent.
  * All-integer (hop counts), so results are engine-replayable and
  * partition-order independent — min over a union of integer layers has
  * no ties to break.
  *
  * Scale posture: one frontier round per hop — BFS hop semantics are
  * inherently O(depth) rounds, and crawl policies use SMALL depths (the
  * whole point is to bound them); for arbitrary-diameter reachability
  * without per-hop labels use [[ConnectedComponents.components]]
  * (O(log n) star contraction). Each round shuffles the edge list once
  * (join on the frontier's src key), one `distinct` over newly-reached
  * nodes, and one left_anti against the visited set; the frontier is
  * `localCheckpoint`ed per round (it gates the early-exit count and
  * truncates iterative lineage — the [[PageRank.ranks]] pattern). The
  * per-round early-exit count is the one driver-side scalar.
  */
object Bfs {

  /** (node, depth) for every node within `maxDepth` hops of `seeds`.
    *
    * @param edges    directed edge list
    * @param srcCol   edge source column name in `edges`
    * @param dstCol   edge destination column name in `edges`
    * @param seeds    seed node set (depth 0); extra columns are ignored
    * @param seedCol  node column name in `seeds`
    * @param maxDepth maximum hop count (inclusive)
    */
  def depths(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String,
      maxDepth: Int): DataFrame = {
    require(maxDepth >= 0, "maxDepth must be >= 0")
    require(maxDepth <= 64,
      s"maxDepth $maxDepth: BFS pays one distributed round per hop — " +
        "beyond ~64 hops you want star-contraction reachability, not BFS")
    // r16: no Par.fan — per-row work is integer arithmetic, so the
    // bytes-proportional scan partitioning is already scale-adaptive and
    // the fan's round-robin exchange was pure overhead (guide §2.4).
    val e = Par.cached(
      edges.select(col(srcCol).as("__s"), col(dstCol).as("__d")))
    var dist = seeds
      .select(col(seedCol).as("node"))
      .distinct()
      .withColumn("depth", lit(0).cast(IntegerType))
      .localCheckpoint()
    var frontier = dist
    var d = 1
    var exhausted = frontier.isEmpty
    while (d <= maxDepth && !exhausted) {
      val next = e
        .join(frontier.select(col("node").as("__s")), Seq("__s"))
        .select(col("__d").as("node"))
        .distinct()
        .join(dist.select(col("node")), Seq("node"), "left_anti")
        .withColumn("depth", lit(d).cast(IntegerType))
        .localCheckpoint() // eager: gates the early-exit check below and
                           // keeps the union tree flat (one leaf per layer)
      exhausted = next.isEmpty
      if (!exhausted) {
        dist = dist.union(next)
        frontier = next
      }
      d += 1
    }
    dist
  }

  /** Convenience: seeds given as a predicate over the edge sources. */
  def depthsFrom(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seedPredicate: Column,
      maxDepth: Int): DataFrame =
    depths(
      edges,
      srcCol,
      dstCol,
      edges.filter(seedPredicate).select(col(srcCol)),
      srcCol,
      maxDepth)
}
