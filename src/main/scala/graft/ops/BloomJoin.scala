package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** Bloom-prefiltered joins: the 100 TB answer to "drop every corpus row
  * whose key appears in that other big table" (blocklists, already-ingested
  * registries, cross-corpus dedup).
  *
  * A plain `left_anti` join shuffles the ENTIRE probe side. Here the build
  * side's keys are folded into a Bloom filter (one partial-agg pass, a few
  * MB on the driver regardless of build row count), the filter rides to the
  * probe executors as a foldable literal inside whole-stage codegen
  * (Spark's own runtime-filter expression, `BloomFilterMightContain` over
  * `xxhash64`), and only the rows the filter cannot rule out — true matches
  * plus the `fpp` false-positive slice — enter the exact join. The result
  * is EXACTLY the plain join's: the Bloom pass only routes rows, the exact
  * join decides them.
  *
  * Memory bound: `numBits = -n·ln(fpp)/ln²2` ≈ 7.3 bits/key at fpp=0.03.
  * [[BloomFilterAggregate]] rejects sizes above the session confs
  * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` (default 4M keys)
  * and `.maxNumBits` (default 64 Mbit = 8 MB), so both are clamped to the
  * session's values here — past the clamp the filter silently degrades
  * toward a higher effective fpp (more rows take the exact-join detour;
  * the result stays exact). For very large build sides raise those confs
  * to the executor-memory budget.
  */
object BloomJoin {

  /** Default false-positive probability: 3% of non-matching probe rows take
    * the exact-join detour.
    */
  val DefaultFpp = 0.03

  private def numBitsFor(n: Long, fpp: Double, maxBits: Long): Long = {
    val bits = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    math.min(math.max(bits, 64L), maxBits)
  }

  /** The build side's keys as a Bloom filter byte blob (driver-held,
    * size-clamped to the session's runtime bloom-filter confs), built in
    * one distributed partial-agg pass over `xxhash64(key)`. `None` when the
    * build side has no non-null keys — the aggregate evaluates to SQL NULL
    * over zero rows, which the callers must treat as "no filter", not
    * "matches nothing".
    */
  private def buildFilter(
      build: DataFrame,
      buildKey: String,
      expectedItems: Long,
      fpp: Double): Option[Array[Byte]] = {
    val conf = build.sparkSession.sessionState.conf
    import org.apache.spark.sql.internal.SQLConf
    val maxItems = conf.getConf(SQLConf.RUNTIME_BLOOM_FILTER_MAX_NUM_ITEMS)
    val maxBits = conf.getConf(SQLConf.RUNTIME_BLOOM_FILTER_MAX_NUM_BITS)
    val requested = if (expectedItems > 0) expectedItems
      else math.max(build.count(), 1L)
    val n = math.min(requested, maxItems)
    val agg = new BloomFilterAggregate(
      ColumnShim.expression(xxhash64(col(buildKey))),
      Literal(n),
      Literal(numBitsFor(n, fpp, maxBits))).toAggregateExpression()
    Option(
      build
        .filter(col(buildKey).isNotNull)
        .select(ColumnShim.column(agg))
        .head()
        .getAs[Array[Byte]](0))
  }

  /** `might-contain(key)` as a codegen'd predicate over the serialized
    * filter.
    */
  private def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnShim.column(
      BloomFilterMightContain(
        Literal(bloom, BinaryType),
        ColumnShim.expression(xxhash64(key))))

  /** Exact anti-join, Bloom-accelerated: rows of `probe` whose `probeKey`
    * does not appear in `build.buildKey`. Identical result to
    * `probe.join(build, probe(probeKey) === build(buildKey), "left_anti")`
    * — rows the filter proves absent (plus null keys, which never
    * equi-match) pass through map-side; only the might-match slice is
    * joined exactly.
    *
    * `expectedItems ≤ 0` (the default) sizes the filter from a count of the
    * build side.
    */
  /** Internal alias for the build key — sidesteps ambiguous-attribute
    * resolution when probe and build share column names (the semi/anti
    * output carries probe columns only, so the rename is invisible).
    */
  private val BuildKeyAlias = "__bloom_build_key"

  private def keyedBuild(build: DataFrame, buildKey: String): DataFrame =
    build.select(col(buildKey).as(BuildKeyAlias))

  def antiJoin(
      probe: DataFrame,
      probeKey: String,
      build: DataFrame,
      buildKey: String,
      expectedItems: Long = 0L,
      fpp: Double = DefaultFpp): DataFrame = {
    require(
      probeKey != BuildKeyAlias,
      s"probe key must not be named $BuildKeyAlias")
    // NOTE on build-side reuse: the build side is consumed up to three
    // times (sizing count when expectedItems is defaulted, the Bloom
    // aggregate, the exact join's input). The op does NOT cache it —
    // measured r17: for cheap build sides (a filtered scan) a cache
    // costs more than the re-scan (p_bloom_antijoin 0.68→0.75 s,
    // p_cross_dedup 0.44→0.56 s). Callers whose build side is an
    // expensive derived frame should pass a Par.cached frame
    // (u_domain_block does).
    buildFilter(build, buildKey, expectedItems, fpp) match {
      case None =>
        // Empty build side: nothing to subtract — the anti-join identity.
        probe
      case Some(bloom) =>
        val k = col(probeKey)
        val maybe = mightContain(bloom, k)
        val clear = probe.filter(k.isNull || !maybe)
        val checked = probe
          .filter(k.isNotNull && maybe)
          .join(
            keyedBuild(build, buildKey),
            k === col(BuildKeyAlias),
            "left_anti")
        clear.union(checked)
    }
  }

  /** Exact semi-join, Bloom-accelerated: rows of `probe` whose `probeKey`
    * appears in `build.buildKey`. Rows the filter rules out are dropped
    * map-side; only the might-match slice shuffles into the exact
    * `left_semi`.
    */
  def semiJoin(
      probe: DataFrame,
      probeKey: String,
      build: DataFrame,
      buildKey: String,
      expectedItems: Long = 0L,
      fpp: Double = DefaultFpp): DataFrame = {
    require(
      probeKey != BuildKeyAlias,
      s"probe key must not be named $BuildKeyAlias")
    // build-side reuse: deliberately uncached — see the antiJoin note.
    buildFilter(build, buildKey, expectedItems, fpp) match {
      case None =>
        // Empty build side: nothing can match — the semi-join zero.
        probe.filter(lit(false))
      case Some(bloom) =>
        val k = col(probeKey)
        probe
          .filter(k.isNotNull && mightContain(bloom, k))
          .join(
            keyedBuild(build, buildKey),
            k === col(BuildKeyAlias),
            "left_semi")
    }
  }
}
