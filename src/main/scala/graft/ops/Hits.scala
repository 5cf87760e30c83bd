package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs-and-authorities scoring (Kleinberg, JACM 1999) — the
  * second classic link-analysis signal next to [[PageRank]]: a page is a
  * good AUTHORITY when good hubs link to it, and a good HUB when it links
  * to good authorities. Crawl/curation pipelines use the pair where
  * PageRank's single score conflates the two roles (link directories and
  * seed lists are hubs, canonical content pages are authorities).
  *
  * EXACT INTEGER arithmetic throughout, the [[PageRank.ranks]] contract:
  * float mutual-reinforcement sums are shuffle-order-dependent; integer
  * sums are not, so the result is deterministic, engine-portable, and
  * hash-gateable. The textbook L2 normalisation is replaced by an
  * integer-exact rescale — after each half-step the scores are floor-
  * divided by `max(1, ⌊max/scale⌋)`, pinning the maximum score to
  * `[scale, 2·scale)`. Normalisation in HITS only fixes the scale (the
  * fixpoint direction is the principal eigenvector either way), so a
  * max-rescale preserves the ranking semantics while keeping every value
  * a long.
  *
  * Overflow bound: rescaled scores stay < 2·scale, so a half-step sum is
  * < maxDegree · 2 · scale — at the default scale 10⁶ that is safe to an
  * in/out-degree of 4.6·10¹², far past any real link graph.
  *
  * Scale posture: the same edge-partitioned shape as PageRank — per
  * half-step one shuffle joining scores to edges on one endpoint and one
  * partial-agg'd shuffle summing on the other (integer sums combine
  * map-side, so a billion-in-link authority receives one row per map
  * partition, not per edge). The rescale divisor is a 1-row aggregate
  * broadcast into the plan — never a driver collect. Edges and the node
  * set are cached once; each half-step's node-sized aggregate is
  * `localCheckpoint`ed so lineage stays bounded across iterations.
  */
object Hits {

  /** Integer-scaled HITS over an edge list (multi-edges count with their
    * multiplicity, matching [[PageRank.ranks]]).
    * Output: (`node`, `hub`, `authority`) — one row per node appearing as
    * a source or destination, scores longs with max in `[scale, 2·scale)`
    * per side (0 for sides with no incident edges).
    */
  def ranks(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 5,
      scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    require(scale >= 1000L && scale <= 1000000000000L,
      "scale must stay in [1e3, 1e12] so half-step sums cannot overflow")
    // r16: no Par.fan — per-row work is integer arithmetic, so the
    // bytes-proportional scan partitioning is already scale-adaptive and
    // the fan's round-robin exchange was pure overhead (guide §2.4).
    val e = Par.cached(
      edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst")))
    val nodes = Par.cached(
      e.select(col("__src").as("node"))
        .union(e.select(col("__dst").as("node")))
        .distinct())

    // one half-step: raw(node) = Σ incident scores, rescaled so the max
    // lands in [scale, 2·scale); the divisor is a broadcast 1-row aggregate.
    // raw is EAGERLY localCheckpointed: read three times (divisor agg,
    // rescale, next half-step), and the A/B against both a cached variant
    // and a lazy checkpoint measured the eager cut fastest at sf0.1
    // (11.5s vs 13.7s cached / 14.4s lazy — deeper live plans cost more
    // in planning than the per-half-step barrier costs in scheduling).
    def halfStep(scores: DataFrame, scoreCol: String, joinOn: String,
        emit: String, outCol: String): DataFrame = {
      val raw = e
        .join(scores, e(joinOn) === scores("node"))
        .groupBy(e(emit).as("node"))
        .agg(sum(col(scoreCol)).as("__raw"))
        .localCheckpoint()
      val div = raw.agg(
        greatest(
          lit(1L),
          Sampling.divFloor(coalesce(max(col("__raw")), lit(1L)), lit(scale)))
          .as("__dv"))
      val scaled = raw
        .crossJoin(broadcast(div))
        .select(
          col("node"),
          Sampling.divFloor(col("__raw"), col("__dv")).as(outCol))
      nodes
        .join(scaled, Seq("node"), "left")
        .select(col("node"), coalesce(col(outCol), lit(0L)).as(outCol))
    }

    var h = nodes.select(col("node"), lit(scale).as("__h"))
    var a: DataFrame = null
    for (_ <- 1 to iters) {
      a = halfStep(h, "__h", "__src", "__dst", "__a")
      h = halfStep(a, "__a", "__dst", "__src", "__h")
    }
    h.join(a, Seq("node"))
      .select(col("node"), col("__h").as("hub"), col("__a").as("authority"))
      .localCheckpoint() // the PageRank last-iteration cut: callers chain
                         // on a flat node-sized RDD, not the iteration tree
  }
}
