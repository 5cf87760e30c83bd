package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Link-graph authority scoring — the PageRank signal web-curation
  * pipelines weight domains/hosts by (crawl frontier prioritization,
  * per-domain quality priors). Simplified power iteration with a fixed
  * iteration count and EXACT INTEGER arithmetic throughout, so the result
  * is deterministic (float mass sums are shuffle-order-dependent; integer
  * sums are not), engine-portable, and hash-gateable:
  *
  *   - ranks are longs scaled by `scale` (default 10¹²);
  *   - each iteration: contribution of edge u→v =
  *     `(rank_u · dampNum) intdiv (dampDen · outdeg_u)` — exact integer
  *     division (the weightedMix subtract-the-remainder pattern keeps the
  *     double division exact); new rank = base + Σ contributions with
  *     `base = (scale · (dampDen − dampNum)) intdiv (dampDen · N)`;
  *   - dangling mass (nodes without out-edges) is DROPPED by default, the
  *     standard simplified variant — ranks are a quality ORDERING signal,
  *     not a probability distribution, and the leak is uniform per
  *     iteration. Opt-in `redistributeDangling = true` folds the dangling
  *     mass back uniformly (the textbook definition): each iteration
  *     computes the total rank of out-degree-0 nodes as ONE scalar
  *     aggregate (a 1-row relation, broadcast — never a driver collect)
  *     and adds `(danglingMass · dampNum) intdiv (dampDen · N)` to every
  *     node, keeping the integer-exact, hash-gateable contract.
  *
  * Scale posture: the classic edge-partitioned shape — per iteration one
  * shuffle joining ranks to edges on the source and one partial-agg'd
  * shuffle summing contributions on the destination (integer sums combine
  * map-side, so a billion-in-link authority node receives one row per map
  * partition, not per edge). Out-degrees are computed once. The node count
  * is the only driver-side scalar. Iterations chain linearly — fixed small
  * `iters` (authority signals converge in a handful of rounds).
  */
object PageRank {

  /** Exact integer division of non-negative longs as a Column (double
    * division is exact once the remainder is subtracted — numerator and
    * quotient stay far below 2⁵³ for any realistic scale/degree).
    */
  private def intDiv(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
    ((x - pmod(x, y)) / y).cast(LongType)

  /** Personalized PageRank from a SEED set — the TrustRank construction
    * (Gyongyi et al., VLDB 2004): teleportation returns mass only to the
    * trusted seeds, so rank measures link-proximity to them. Crawl
    * curation uses it to damp spam neighborhoods that plain PageRank
    * rewards (link farms inflate global in-link mass but sit far from any
    * trusted seed). Same exact-integer contract as [[ranks]]: the
    * teleport share `(scale·(dampDen−dampNum)) intdiv (dampDen·|S|)`
    * lands on seed nodes only, initial mass `scale intdiv |S|` on seeds,
    * zero elsewhere; dangling mass is dropped (the simplified variant —
    * trust is an ordering signal). Seeds are broadcast into the node
    * frame as a flag; everything else is the [[ranks]] plan shape.
    *
    * Output: (`node`, `rank`) — rank 0 for nodes unreachable from the
    * seed set, making "reachable from trust" a simple `rank > 0` filter.
    */
  def personalizedRanks(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String,
      iters: Int = 5,
      scale: Long = 1000000000000L,
      dampNum: Long = 85,
      dampDen: Long = 100): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    require(dampNum > 0 && dampDen > dampNum, "damping must satisfy 0 < num < den")
    // same bound style as Hits.ranks: caller-supplied scale/damping must
    // keep scale*(dampDen-dampNum), rank*dampNum and dampDen*deg inside
    // Long — unbounded values would overflow silently (or as an opaque
    // ANSI error) and break the exact-integer contract
    require(scale >= 1000L && scale <= 1000000000000L,
      "scale must stay in [1e3, 1e12] so rank sums cannot overflow")
    require(dampDen <= 1000L,
      "dampDen must stay <= 1000 so damping products cannot overflow")
    // r16: same two changes as [[ranks]] — no Par.fan on the edge/seed
    // frames (integer-arith per-row work; scan partitioning is already
    // scale-adaptive) and the out-degree joined into the cached edge
    // frame ONCE instead of per iteration (guide §2.4).
    val eRaw = Par.cached(
      edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst")))
    val e = Par.cached(
      eRaw.join(
        eRaw.groupBy(col("__src")).agg(count(lit(1)).as("__deg")),
        Seq("__src")))
    val seedSet = Par.cached(
      seeds.select(col(seedCol).as("node")).distinct())
    // node frame carries the seed flag (broadcast membership join — the
    // seed list is tiny by construction)
    val nodes = Par.cached(
      eRaw.select(col("__src").as("node"))
        .union(eRaw.select(col("__dst").as("node")))
        .distinct()
        .join(broadcast(seedSet.select(col("node"), lit(true).as("__seed"))),
          Seq("node"), "left")
        .select(
          col("node"),
          coalesce(col("__seed"), lit(false)).as("__seed")))
    val ns = nodes.filter(col("__seed")).count()
    require(ns >= 1, "seed set must intersect the graph's node set")
    val base = (scale * (dampDen - dampNum)) / (dampDen * ns)
    val teleport =
      when(col("__seed"), lit(base)).otherwise(lit(0L))
    var r = nodes.select(
      col("node"),
      when(col("__seed"), lit(scale / ns)).otherwise(lit(0L)).as("rank"))
    def cut(df: DataFrame, i: Int): DataFrame =
      if (i % 2 == 0 || i == iters) df.localCheckpoint() else df
    for (i <- 1 to iters) {
      val contrib = e
        .join(r, e("__src") === r("node"))
        .select(
          col("__dst").as("node"),
          intDiv(col("rank") * lit(dampNum), lit(dampDen) * col("__deg"))
            .as("__c"))
        .groupBy(col("node"))
        .agg(sum(col("__c")).as("__in"))
      r = cut(
        nodes
          .join(contrib, Seq("node"), "left")
          .select(
            col("node"),
            (teleport + coalesce(col("__in"), lit(0L))).as("rank")),
        i)
    }
    r
  }

  /** Integer-scaled simplified PageRank over an edge list.
    * Output: (`node`, `rank`) — one row per node appearing as a source or
    * destination, rank a long in `scale` units.
    */
  def ranks(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 5,
      scale: Long = 1000000000000L,
      dampNum: Long = 85,
      dampDen: Long = 100,
      redistributeDangling: Boolean = false): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    require(dampNum > 0 && dampDen > dampNum, "damping must satisfy 0 < num < den")
    // same Long-overflow bounds as personalizedRanks: rank sums stay ≤
    // scale·dampNum and the dangling path computes lit(dampDen · n)
    // driver-side — unbounded scale/dampDen would overflow silently
    require(scale >= 1000L && scale <= 1000000000000L,
      "scale must stay in [1e3, 1e12] so rank sums cannot overflow")
    require(dampDen <= 1000L,
      "dampDen must stay <= 1000 so damping products cannot overflow")
    // edges and the node set are read EVERY iteration — cache them, and
    // localCheckpoint each iteration's ranks (the nearDupClusters
    // iterative-state pattern: without it the lineage re-derives the whole
    // graph per level and the plan tree grows multiplicatively; iteration
    // state is node-sized, the canonical thing to materialize).
    //
    // r16 (guide §2.4): the out-degree is JOINED INTO the cached edge
    // frame once, up front, instead of re-joined every iteration — the
    // per-iteration plan drops from two joins to one, removing
    // (iters − 1) edge-sized join passes. The join is the same equi-join
    // the old per-iteration plan ran (partial-agg'd degree side), so the
    // contribution values are bit-identical. No Par.fan on the edges:
    // per-row work here is integer arithmetic, so the bytes-proportional
    // scan partitioning is already the scale-adaptive choice and the
    // fan's round-robin exchange was pure overhead at every scale.
    // eRaw cached too: the caller's edge expression can be expensive
    // (u_host_rank derives URL domains per edge) and feeds the degree
    // join (twice) plus both node-set branches — uncached it would
    // re-evaluate four times while e materializes.
    val eRaw = Par.cached(
      edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst")))
    val e = Par.cached(
      eRaw.join(
        eRaw.groupBy(col("__src")).agg(count(lit(1)).as("__deg")),
        Seq("__src")))
    val nodes = Par.cached(
      eRaw.select(col("__src").as("node"))
        .union(eRaw.select(col("__dst").as("node")))
        .distinct())
    val n = nodes.count() // the one driver-side scalar
    // dangling membership test: the DISTINCT source set (node-sized, the
    // role the pre-r16 outdeg frame played). Anti-joining the raw edge
    // list instead would re-scan |E| rows per iteration for a |V|-sized
    // set test — measured +1.5s on u_pagerank_dangling at sf0.1.
    val srcs =
      if (redistributeDangling)
        Par.cached(eRaw.select(col("__src")).distinct())
      else null
    val base = (scale * (dampDen - dampNum)) / (dampDen * n)
    var r = nodes.select(col("node"), lit(scale / n).as("rank"))
    // Checkpoint cadence: every SECOND iteration (and always the last).
    // One checkpoint per iteration pays an eager node-sized materialization
    // each round purely for lineage hygiene; letting the plan grow across
    // two rounds before cutting keeps the tree bounded (≤2 iterations deep)
    // while dropping the eager jobs from `iters` to ⌈iters/2⌉. Gate-verified
    // bit-identical at sf0.01; bench-neutral at sf0.1 where the rank vector
    // is tiny — the saving is the halved node-sized checkpoint I/O when the
    // node set is large.
    def cut(df: DataFrame, i: Int): DataFrame =
      if (i % 2 == 0 || i == iters) df.localCheckpoint() else df
    for (i <- 1 to iters) {
      val contrib = e
        .join(r, e("__src") === r("node"))
        .select(
          col("__dst").as("node"),
          intDiv(col("rank") * lit(dampNum), lit(dampDen) * col("__deg"))
            .as("__c"))
        .groupBy(col("node"))
        .agg(sum(col("__c")).as("__in"))
      val withBase = nodes
        .join(contrib, Seq("node"), "left")
        .select(
          col("node"),
          (lit(base) + coalesce(col("__in"), lit(0L))).as("rank"))
      r =
        if (!redistributeDangling) cut(withBase, i)
        else {
          // dangling mass this iteration = Σ rank over out-degree-0 nodes,
          // ONE 1-row aggregate broadcast into the plan (no driver action);
          // per-node share = (mass · dampNum) intdiv (dampDen · N) — longs
          // stay ≤ scale·dampNum ≪ 2⁵³, so intDiv remains exact
          val dangling = r
            .join(srcs, r("node") === srcs("__src"), "left_anti")
            .agg(coalesce(sum(col("rank")), lit(0L)).as("__dmass"))
          withBase
            .crossJoin(broadcast(dangling))
            .select(
              col("node"),
              (col("rank") +
                intDiv(col("__dmass") * lit(dampNum), lit(dampDen * n)))
                .as("rank"))
            .localCheckpoint() // every round: next round's dangling agg
                               // re-reads r — uncut lineage would double
                               // the whole prior plan inside it
        }
    }
    r
  }
}
