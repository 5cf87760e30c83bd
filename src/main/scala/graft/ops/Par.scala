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

  /** Persist an op intermediate and register it for [[releaseCaches]].
    * MEMORY_AND_DISK: spills instead of recomputing when executors are
    * memory-tight.
    */
  def cached(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    live.add(p)
    p
  }

  /** Unpersist every intermediate persisted via [[cached]] (non-blocking).
    * Ops return lazy DataFrames, so they cannot unpersist their own
    * intermediates; callers invoke this after the terminal action on an
    * op's result. Long-lived sessions embedding `graft.ops` should call it
    * between pipeline runs to avoid cache leaks.
    */
  def releaseCaches(): Unit = {
    var df = live.poll()
    while (df != null) {
      df.unpersist(false)
      df = live.poll()
    }
  }
}
