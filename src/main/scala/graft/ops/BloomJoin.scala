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
  * Memory bound: `numBits = -n·ln(fpp)/ln²2` ≈ 7.3 bits/key at fpp=0.03 —
  * 10⁹ build keys ≈ 0.9 GB, so size `fpp` to the driver/executor budget
  * (the default cap keeps it ≤ 64 MB unless raised).
  */
object BloomJoin {

  /** Default false-positive probability: 3% of non-matching probe rows take
    * the exact-join detour.
    */
  val DefaultFpp = 0.03

  /** Hard cap on filter size (512 MB) — past this the filter itself becomes
    * the broadcast problem it was meant to avoid.
    */
  val MaxNumBits: Long = 1L << 32

  private def numBitsFor(n: Long, fpp: Double): Long = {
    val bits = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    math.min(math.max(bits, 64L), MaxNumBits)
  }

  /** The build side's keys as a Bloom filter byte blob (driver-held,
    * size-bounded by `numBitsFor`), built in one distributed partial-agg
    * pass over `xxhash64(key)`.
    */
  private def buildFilter(
      build: DataFrame,
      buildKey: String,
      expectedItems: Long,
      fpp: Double): Array[Byte] = {
    val n = if (expectedItems > 0) expectedItems
      else math.max(build.count(), 1L)
    val agg = new BloomFilterAggregate(
      ColumnShim.expression(xxhash64(col(buildKey))),
      Literal(n),
      Literal(numBitsFor(n, fpp))).toAggregateExpression()
    build
      .filter(col(buildKey).isNotNull)
      .select(ColumnShim.column(agg))
      .head()
      .getAs[Array[Byte]](0)
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
    val bloom = buildFilter(build, buildKey, expectedItems, fpp)
    val k = col(probeKey)
    val maybe = mightContain(bloom, k)
    val clear = probe.filter(k.isNull || !maybe)
    val checked = probe
      .filter(k.isNotNull && maybe)
      .join(keyedBuild(build, buildKey), k === col(BuildKeyAlias), "left_anti")
    clear.union(checked)
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
    val bloom = buildFilter(build, buildKey, expectedItems, fpp)
    val k = col(probeKey)
    probe
      .filter(k.isNotNull && mightContain(bloom, k))
      .join(keyedBuild(build, buildKey), k === col(BuildKeyAlias), "left_semi")
  }
}
