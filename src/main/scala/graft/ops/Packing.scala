package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — assigning tokenized documents to fixed-capacity
  * training sequences (the "pack to 4096 tokens" step between a cleaned
  * corpus and a training dataloader).
  *
  * Contiguous packing: documents are laid out in deterministic order and
  * cut into bins of `capacity` tokens by cumulative token count — bin id
  * and offset derive from a running sum, so the layout is reproducible
  * run-to-run and engine-to-engine (pure integer arithmetic).
  *
  * Scale posture: packing is inherently sequential WITHIN a stream, so the
  * corpus is split into `shards` deterministic shards per `partCols` group
  * (hash of the id), each packed independently — one window task per
  * (group, shard), bounded by shard size, not corpus size. That mirrors how
  * production packers shard: global packing order is not meaningful across
  * a distributed corpus, per-shard order is.
  */
object Packing {

  /** Pack documents into `capacity`-token bins within (partCols, shard).
    *
    * Output columns: partCols..., `shard`, doc id, `n_tokens`, `bin` (0-based
    * within the shard) and `bin_offset` (token offset where the document
    * starts inside its bin; a document whose tokens cross a bin boundary
    * starts in `bin` and spills forward, the standard contiguous layout).
    */
  def sequencePack(
      df: DataFrame,
      idCol: String,
      tokensCol: Column,
      capacity: Long,
      partCols: Seq[String] = Nil,
      shards: Int = 16): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    require(shards > 0, "shards must be positive")
    val shard = pmod(TextFunctions.hash61(col(idCol).cast("string")),
      lit(shards.toLong)).as("shard")
    val staged = Par.fan(df).select(
      (partCols.map(col) :+ col(idCol) :+ shard :+
        tokensCol.cast("long").as("n_tokens")): _*)
    val w = Window
      .partitionBy((partCols.map(col) :+ col("shard")): _*)
      .orderBy(col(idCol))
    val cumBefore =
      coalesce(sum(col("n_tokens")).over(w) - col("n_tokens"), lit(0L))
    // integer `div`, not `/` (double division would round past 2^53)
    staged
      .withColumn("__cum", cumBefore)
      .withColumn("bin", expr(s"__cum div ${capacity}L"))
      .withColumn("bin_offset", expr(s"__cum % ${capacity}L"))
      .drop("__cum")
  }

  /** Assign every row to one of `nShards` output shards so the per-shard
    * total `weight` (token count, byte size) is near-balanced — the
    * "write N equal training files" step. Round-robin over the global
    * DESCENDING weight order: the j-th heaviest row lands in shard
    * (j-1) % n, which bounds any two shard totals to within the single
    * largest row's weight (telescoping over rounds — spec'd), and the
    * assignment is a pure function of (weight, id), so it is reproducible
    * across runs, partitionings and engines.
    *
    * No single-task sort: global rank comes from the
    * [[Sampling.rangePrefix]] machinery (`repartitionByRange` buckets in
    * weight order, per-bucket counts → broadcast prefix offsets, interior
    * rank per bucket-partitioned window) — the same no-global-sort path
    * as [[Sampling.tokenBudgetSelect]].
    *
    * Output = input columns + `shard` (0-based INT).
    */
  /** Shard manifest — the write-audit record a sharded training export
    * needs: per shard, the doc count, total weight, and a CONTENT
    * fingerprint (md5 over the lexicographically-sorted id list) that
    * changes iff the shard's membership changes. Diff two manifests to
    * know which shards to re-upload/re-shuffle after a corpus refresh —
    * the shard-level analog of [[graft.ops.Dedup.snapshotDiff]].
    *
    * One partial-agg'd shuffle on the shard key; all values exact
    * (integers + md5), engine-replayable.
    */
  def shardManifest(
      df: DataFrame,
      shardCol: String,
      idCol: String,
      weight: Column): DataFrame =
    Par.fan(df)
      .select(col(shardCol), col(idCol).cast("string").as("__sm_id"),
        weight.cast("long").as("__sm_w"))
      .groupBy(col(shardCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__sm_w")).as("total_weight"),
        md5(array_join(array_sort(collect_list(col("__sm_id"))), ","))
          .as("content_md5"))

  /** Rendezvous (highest-random-weight) assignment: each row goes to the
    * worker maximizing `hash61(id || '|' || worker)` — the minimal-movement
    * sharding for INCREMENTAL pipelines: adding or removing one worker
    * moves only ~1/|workers| of the corpus (provably only the rows whose
    * new worker IS the added one), where `id % k` reshuffles nearly
    * everything on k→k+1. The standard assignment scheme for sticky
    * shard→executor maps, per-host fetch slots, and cache affinity
    * (Thaler & Ravishankar 1998; what Ceph/consistent-hash rings buy with
    * more machinery).
    *
    * Deterministic and engine-replayable: the winner is the total-order
    * argmax by (score desc, worker desc) — hash ties (~2⁻⁶⁰) break
    * lexicographically. Entirely map-side: |workers| hash evaluations per
    * row, no shuffle, no state.
    */
  def rendezvousAssign(
      df: DataFrame,
      idCol: String,
      workers: Seq[String],
      outCol: String = "worker"): DataFrame = {
    require(workers.nonEmpty, "need at least one worker")
    require(workers.distinct.size == workers.size, "workers must be unique")
    df.withColumn(outCol, rendezvousWinner(col(idCol), workers))
  }

  private def rendezvousWinner(id: Column, workers: Seq[String]): Column = {
    val scored = workers.map { w =>
      struct(
        TextFunctions.hash61(
          concat(id.cast(org.apache.spark.sql.types.StringType),
            lit("|" + w))).as("s"),
        lit(w).as("w"))
    }
    val top =
      if (scored.size == 1) scored.head else greatest(scored: _*)
    top.getField("w")
  }

  /** Movement audit between two worker sets: one row
    * (`n_total`, `n_moved`, `moved_ppm`) counting rows whose rendezvous
    * worker differs under `before` vs `after` — the number that proves
    * the ~1/k movement bound before a resize ships. Map-side scoring +
    * one 1-row aggregate.
    */
  def rendezvousMoveReport(
      df: DataFrame,
      idCol: String,
      before: Seq[String],
      after: Seq[String]): DataFrame =
    Par.fan(df)
      .select(
        rendezvousWinner(col(idCol), before).as("__a"),
        rendezvousWinner(col(idCol), after).as("__b"))
      .agg(
        count(lit(1)).as("n_total"),
        coalesce(sum(when(col("__a") =!= col("__b"), 1L).otherwise(0L)),
          lit(0L)).as("n_moved"))
      .select(
        col("n_total"),
        col("n_moved"),
        when(col("n_total") === 0, lit(0L))
          .otherwise(
            Sampling.divFloor(col("n_moved") * lit(1000000L), col("n_total")))
          .as("moved_ppm"))

  def balancedShards(
      df: DataFrame,
      idCol: String,
      weight: Column,
      nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    // collision guards, matching tokenBudgetSelect/quotaSample: the output
    // column and the staging helpers must not silently clobber input
    // columns (sequencePack also emits `shard` — rename before chaining)
    require(
      !df.columns.contains("shard"),
      "input already has a 'shard' column; rename it before balancedShards")
    val helpers = Seq("__bs_w", "__bs_bkt", "__bs_off", "__bs_rank")
    require(
      !df.columns.exists(helpers.contains),
      s"input must not contain ${helpers.mkString("/")}")
    val base = df.withColumn("__bs_w", weight.cast("long"))
    val (ranged, offsets, _) = Sampling.rangePrefix(
      base,
      Seq(col("__bs_w").desc, col(idCol)),
      lit(1L),
      "__bs_bkt",
      "__bs_off")
    val w = Window
      .partitionBy(col("__bs_bkt"))
      .orderBy(col("__bs_w").desc, col(idCol))
    ranged
      .join(broadcast(offsets), Seq("__bs_bkt"))
      .withColumn("__bs_rank", col("__bs_off") + row_number().over(w))
      .withColumn(
        "shard",
        ((col("__bs_rank") - 1L) % nShards).cast("int"))
      .drop("__bs_bkt", "__bs_off", "__bs_rank", "__bs_w")
  }

  /** Contiguous pretraining-window layout — the GPT-style "concatenate the
    * whole corpus in a fixed order and slice it into exact L-token
    * windows" data prep, computed as METADATA (each document's global
    * token offset and the window ids it spans) without materializing a
    * single token: downstream loaders group by window id and cut each
    * document's contribution from `offset_in_first`. Unlike
    * [[sequencePack]] (bin packing, no doc splitting), documents here
    * CROSS window boundaries — every window is exactly full, the layout
    * every causal-LM pretraining loader expects.
    *
    * Output: input id + `n_tokens`, `tok_start` (global exclusive prefix
    * offset in `order`), `first_window`, `last_window`,
    * `offset_in_first` — all exact longs, a pure function of (order,
    * token counts): reproducible across runs, partitionings and engines.
    *
    * Scale posture: the global offsets ride [[Sampling.rangePrefix]] (no
    * single-task sort — range buckets, one-row-per-partition offset
    * collect, bucket-partitioned interior windows), then pure per-row
    * integer arithmetic. One range exchange + one bucket regroup, the
    * same bill as [[Sampling.tokenBudgetSelect]].
    */
  def contiguousWindows(
      df: DataFrame,
      idCol: String,
      tokens: Column,
      windowLen: Long): DataFrame = {
    require(windowLen > 0, "windowLen must be positive")
    val helpers = Seq("__cw_tok", "__cw_bkt", "__cw_off", "__cw_cum")
    require(
      !df.columns.exists(helpers.contains),
      s"input must not contain ${helpers.mkString("/")}")
    // Exact integer floor division (IntegralDivide) — the double
    // round-trip is only exact below 2^53, a real ceiling for global
    // token positions at 100 TB (Sampling.divFloor is the repo-wide
    // convention).
    def intDiv(x: Column, y: Column): Column = Sampling.divFloor(x, y)
    val base = df.withColumn("__cw_tok", tokens.cast("long"))
    val (ranged, offsets, _) = Sampling.rangePrefix(
      base,
      Seq(col(idCol)),
      col("__cw_tok"),
      "__cw_bkt",
      "__cw_off")
    val w = Window.partitionBy(col("__cw_bkt")).orderBy(col(idCol))
    val L = lit(windowLen)
    ranged
      .join(broadcast(offsets), Seq("__cw_bkt"))
      .withColumn("__cw_cum", sum(col("__cw_tok")).over(w))
      .select(
        col(idCol),
        col("__cw_tok").as("n_tokens"),
        (col("__cw_off") + col("__cw_cum") - col("__cw_tok")).as("tok_start"))
      .withColumn("first_window", intDiv(col("tok_start"), L))
      .withColumn(
        "last_window",
        intDiv(col("tok_start") + col("n_tokens") - 1, L))
      .withColumn(
        "offset_in_first",
        col("tok_start") - col("first_window") * L)
  }

  /** Deterministic global shuffle — the "randomize example order before
    * training" step, as a reproducible permutation instead of an
    * unseedable cluster-order accident. Every row gets a global position
    * `pos` ∈ [0, n) ordered by (hash61(seed:id), id) — a keyed hash, so
    * the permutation is (a) pseudorandom, (b) identical run-to-run and
    * engine-to-engine, (c) re-derivable for any single id without touching
    * the corpus — plus its output shard `pos ⌊/⌋ shardSize` (contiguous
    * equal-size shards in permuted order, what a dataloader actually
    * reads).
    *
    * Scale posture: no global sort materializes a total order on one
    * node — [[Sampling.rangePrefix]] range-partitions by the hash key,
    * turns per-bucket COUNTS (one row per partition) into broadcast prefix
    * offsets, and positions are offset + bucket-local row_number. Same
    * machinery as [[Sampling.exactQuantiles]]/[[contiguousWindows]]; the
    * per-bucket window is bounded by partition size, never corpus size.
    */
  def globalShuffle(
      df: DataFrame,
      idCol: String,
      seed: String = "shuffle",
      shardSize: Long = 64L): DataFrame = {
    require(shardSize > 0, "shardSize must be positive")
    val helpers = Seq("__gs_h", "__gs_bkt", "__gs_off")
    require(
      !df.columns.exists(helpers.contains),
      s"input must not contain ${helpers.mkString("/")}")
    // Exact integer floor division (IntegralDivide) — the double
    // round-trip is only exact below 2^53, a real ceiling for global
    // token positions at 100 TB (Sampling.divFloor is the repo-wide
    // convention).
    def intDiv(x: Column, y: Column): Column = Sampling.divFloor(x, y)
    val base = df.withColumn(
      "__gs_h",
      TextFunctions.hash61(
        concat(lit(seed + ":"), col(idCol).cast("string"))))
    val (ranged, offsets, _) = Sampling.rangePrefix(
      base,
      Seq(col("__gs_h").asc, col(idCol).asc),
      lit(1L),
      "__gs_bkt",
      "__gs_off")
    val w = Window
      .partitionBy(col("__gs_bkt"))
      .orderBy(col("__gs_h").asc, col(idCol).asc)
    ranged
      .join(broadcast(offsets), Seq("__gs_bkt"))
      .withColumn("pos", col("__gs_off") + row_number().over(w) - 1)
      .withColumn("shard", intDiv(col("pos"), lit(shardSize)))
      .drop("__gs_h", "__gs_bkt", "__gs_off")
  }

  /** Deterministic SOURCE-INTERLEAVED training order — the mixture
    * SCHEDULING step after mixture design (P75) and sampling (P23): a
    * dataloader reading positions 0..n-1 sequentially sees every source
    * at its corpus proportion in every prefix, instead of the
    * source-blocked order a naive concat-of-datasets produces (which
    * trains on source A for a million steps before source B exists).
    *
    * Construction: within each source, rows get a pseudorandom order
    * `p ∈ 1..n_s` by (keyed hash, id); globally rows sort by fractional
    * PROGRESS `p / n_s` (ties → (source, p)). Source s's k-th row lands
    * at global progress k/n_s, so a prefix of global length m ending at
    * progress t holds `t·n_s ± 1` rows of s while `m = t·n ± S`
    * (S = source count) — every prefix is proportional by construction
    * (deviation bounded by `1 + S·n_s/n`, a constant in the SOURCE
    * count), not merely in expectation like a hash-shuffled order.
    * Progress is one exact-integer division per row
    * (two longs → one correctly-rounded double), identical cross-engine;
    * the (progress, source, p) order is total, so positions are a
    * reproducible bijection.
    *
    * Scale posture: one shuffle on the source key for the per-source
    * window (the P38 per-group-window trade — a pathologically dominant
    * source bounds one window task; split such a source upstream), then
    * the [[Sampling.rangePrefix]] no-global-sort machinery for global
    * positions (range exchange + broadcast prefix offsets + bucket-local
    * windows — the [[globalShuffle]] shape).
    *
    * Output: input columns + `pos` (global 0-based training position).
    */
  def interleaveBySource(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      seed: String = "interleave"): DataFrame = {
    val helpers =
      Seq("__il_h", "__il_p", "__il_n", "__il_prog", "__il_bkt", "__il_off")
    require(
      !df.columns.exists(helpers.contains),
      s"input must not contain ${helpers.mkString("/")}")
    val base = df.withColumn(
      "__il_h",
      TextFunctions.hash61(
        concat(lit(seed + ":"), col(idCol).cast("string"))))
    val ws = Window
      .partitionBy(col(sourceCol))
      .orderBy(col("__il_h").asc, col(idCol).asc)
    val wn = Window.partitionBy(col(sourceCol))
    val positioned = base
      .withColumn("__il_p", row_number().over(ws).cast("long"))
      .withColumn("__il_n", count(lit(1)).over(wn))
      .withColumn(
        "__il_prog",
        col("__il_p").cast("double") / col("__il_n").cast("double"))
    val order =
      Seq(col("__il_prog").asc, col(sourceCol).asc, col("__il_p").asc)
    val (ranged, offsets, _) =
      Sampling.rangePrefix(positioned, order, lit(1L), "__il_bkt", "__il_off")
    val wg = Window
      .partitionBy(col("__il_bkt"))
      .orderBy(order: _*)
    ranged
      .join(broadcast(offsets), Seq("__il_bkt"))
      .withColumn("pos", col("__il_off") + row_number().over(wg) - 1)
      .drop(helpers: _*)
  }
}
