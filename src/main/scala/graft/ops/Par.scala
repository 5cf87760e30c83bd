package graft.ops

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Partitioning and cache-hygiene helpers shared by the ops.
  *
  * Scale posture: [[fan]] exists because parquet scans parallelize at
  * row-group granularity — a single-row-group file (small extracts, local
  * test data) pins every downstream per-row expression (md5 shingling, dot
  * products, BPE encodes) to ONE task no matter how many cores the cluster
  * has. At real scale (100 TB = tens of thousands of row groups) the guard
  * is a no-op and adds no shuffle.
  */
object Par {

  /** Run `body` with `spark.sql.shuffle.partitions` scoped to `n`,
    * restoring the session value after. Stateful streaming queries carve
    * one state store PER shuffle partition PER stateful operator side at
    * the checkpoint's first batch; a fixed-size gate fixture under the
    * session's 32 partitions pays 32-64 state-store provider
    * init/commit/maintenance cycles for a handful of rows each — pure
    * fixed overhead (measured: q_stream_outer_join 11.2s -> 4.5s median
    * at 8). At production scale the right number is load-sized and set
    * the same way — it is pinned INTO the checkpoint at creation. Gates
    * run sequentially in Verify/Bench, so the scoped set cannot race.
    */
  def withShufflePartitions[A](
      spark: org.apache.spark.sql.SparkSession, n: Int)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, old)
  }

  /** Fan a low-parallelism scan out to the session's default parallelism.
    * No-op (and no added shuffle) when the input already has at least
    * `defaultParallelism` partitions — i.e. on any at-scale dataset.
    *
    * Only applies to narrow (map-only) plans: anything downstream of a
    * shuffle already runs at `spark.sql.shuffle.partitions`, and probing
    * `.rdd` on an exchange-bearing plan would make AQE materialize its
    * query stages (throwaway jobs). For a narrow scan plan `.rdd` is free.
    */
  def fan(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val widens = df.queryExecution.analyzed.exists {
      case _: Join | _: Aggregate | _: Distinct | _: Window | _: Sort |
          _: RepartitionOperation | _: GlobalLimit =>
        true
      case _ => false
    }
    if (widens) df
    else {
      val p = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < p) df.repartition(p) else df
    }
  }

  private val live = new ConcurrentLinkedQueue[DataFrame]()

  /** Handle over the intermediates one pipeline persisted: releasing it
    * unpersists exactly those DataFrames (and drops them from the global
    * registry), so concurrent pipelines sharing the JVM never release each
    * other's in-use caches.
    */
  final class CacheHandle private[Par] () {
    private val mine = new ConcurrentLinkedQueue[DataFrame]()
    private[Par] def add(df: DataFrame): Unit = mine.add(df)
    def release(): Unit = {
      var df = mine.poll()
      while (df != null) {
        live.remove(df)
        df.unpersist(false)
        df = mine.poll()
      }
    }
  }

  private val currentScope = new ThreadLocal[CacheHandle]()

  /** Run `build` (a driver-side pipeline constructor) with a fresh cache
    * scope: every [[cached]] call made while building is owned by the
    * returned handle. Ops return lazy DataFrames, so release the handle
    * only after the terminal action on the built result.
    */
  def scoped[T](build: => T): (T, CacheHandle) = {
    val h = new CacheHandle
    val prev = currentScope.get()
    currentScope.set(h)
    try (build, h)
    finally {
      if (prev == null) currentScope.remove() else currentScope.set(prev)
    }
  }

  /** Persist an op intermediate and register it for [[releaseCaches]] (and
    * with the enclosing [[scoped]] handle, if any). MEMORY_AND_DISK: spills
    * instead of recomputing when executors are memory-tight.
    */
  def cached(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    live.add(p)
    val scope = currentScope.get()
    if (scope != null) scope.add(p)
    p
  }

  /** Unpersist every intermediate persisted via [[cached]] — an explicit
    * GLOBAL sweep across all pipelines, for one-shot drivers and tools
    * (Bench/Verify). Long-lived sessions running pipelines concurrently
    * should prefer [[scoped]] + `handle.release()` so each pipeline
    * releases only its own intermediates.
    *
    * `blocking = true` (r16, guide §1 "measure correctly"): Bench calls
    * the sweep INSIDE each query's timed window, so a non-blocking
    * unpersist deferred the block-manager removal work into the NEXT
    * query's measurement — measured as a reproducible +0.6s on the
    * successor of a cache-heavy gate (m_media_meta after
    * p_cross_neardup). Blocking charges cleanup to the query that made
    * the caches.
    */
  def releaseCaches(blocking: Boolean = false): Unit = {
    var df = live.poll()
    while (df != null) {
      df.unpersist(blocking)
      df = live.poll()
    }
  }
}
