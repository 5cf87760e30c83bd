package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Salted join for skewed keys.
  *
  * When a handful of hot keys dominate a shuffle join (the classic power-law
  * web-corpus shape), AQE's skew-join split handles sort-merge joins, but
  * aggregations-into-joins and older plans still hot-spot one task. Salting
  * decorrelates explicitly: the skewed (big) side gets a random salt in
  * [0, salts), the small side is exploded `salts` times, and the join key
  * becomes (key, salt) — every hot key spreads over `salts` tasks at the
  * cost of replicating the small side.
  *
  * The salt is derived deterministically from a stable column (portable
  * md5-based hash), not `rand()` — keeps retries, speculative tasks and
  * result comparisons stable.
  */
object SkewJoin {

  /** Inner-join `big` (skewed) with `small` on `bigKey == smallKey`,
    * salting with `salts` buckets. `saltBy` must be a column of `big` that
    * varies within hot keys (e.g. the row's primary key).
    */
  def saltedInnerJoin(
      big: DataFrame,
      bigKey: String,
      saltBy: String,
      small: DataFrame,
      smallKey: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedBig = big.withColumn(
      "__graft_salt",
      (TextFunctions.hash61(col(saltBy).cast(StringType)) % salts)
        .cast(IntegerType))
    val saltedSmall = small
      .withColumn(
        "__graft_salt",
        explode(sequence(lit(0), lit(salts - 1))))
    saltedBig
      .join(
        saltedSmall,
        saltedBig(bigKey) === saltedSmall(smallKey) &&
          saltedBig("__graft_salt") === saltedSmall("__graft_salt"))
      .drop("__graft_salt")
  }

  /** Skew-proof equi-join of a power-law-keyed stream against a build table
    * with exactly ONE row per key (a probability/idf/statistics table): the
    * `hotK` build rows ranked first by `hotOrder` are BROADCAST and joined
    * map-side, so the hot keys' occurrence mass never enters a shuffle; only
    * stream rows whose key is outside the top-K take the shuffled join — and
    * those keys' per-key count is by construction at most the K-th hottest
    * count. Result-identical to `stream.join(build.drop(rankCols), key)`;
    * `hotK = 0` disables the split.
    *
    * The stream side is pre-filtered map-side too (broadcast anti-join
    * against the K hot keys) — otherwise the tail join would still shuffle
    * every hot occurrence just to find no match. `rankCols` are build
    * columns used only for ranking (e.g. a frequency count) and are dropped
    * from the output.
    */
  def hotTailEquiJoin(
      stream: DataFrame,
      build: DataFrame,
      key: String,
      hotOrder: Seq[Column],
      hotK: Int,
      rankCols: Seq[String] = Nil): DataFrame = {
    val buildVals = build.drop(rankCols: _*)
    if (hotK <= 0) stream.join(buildVals, key)
    else {
      // ≤ hotK rows, read three times (hot broadcast, hotSet broadcast,
      // and implicitly by both anti-joins) — cache it so the build
      // relation's top-K aggregation runs once, not per consumer
      val hot = Par.cached(
        build.orderBy(hotOrder: _*).limit(hotK).drop(rankCols: _*))
      val hotSet = hot.select(col(key))
      val hotMass = stream.join(broadcast(hot), key)
      val tailStream =
        stream.join(broadcast(hotSet), Seq(key), "left_anti")
      val tailBuild =
        buildVals.join(broadcast(hotSet), Seq(key), "left_anti")
      hotMass.unionByName(tailStream.join(tailBuild, key))
    }
  }

  /** Skew diagnosis: per-key row counts of the top `n` heaviest keys —
    * cheap input to choosing `salts`.
    */
  def topKeys(df: DataFrame, key: String, n: Int = 20): DataFrame =
    df.groupBy(col(key))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc)
      .limit(n)
}
