package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType}

/** Deterministic corpus sampling.
  *
  * Hash sampling (id hash mod N < threshold) is reproducible run-to-run and
  * engine-to-engine — the property random() sampling lacks and the reason
  * every serious data pipeline samples by hash: re-running the pipeline, or
  * re-deriving the sample in another system, selects the SAME documents.
  */
object Sampling {

  /** Per-mille sampling bucket of an id column (0-999, portable md5-derived
    * hash — DuckDB replays it exactly).
    */
  def bucket(idCol: Column): Column =
    TextFunctions.hash61(idCol.cast(StringType)) % 1000

  /** [[bucket]] salted per decision. Two sampling/mixing decisions made on
    * the same id column must draw INDEPENDENT hashes: after an unsalted
    * 100‰ sample every survivor has bucket < 100, so a later unsalted
    * 2500‰ mix would give ALL survivors the extra copy instead of ~50% —
    * silently biased mixture proportions. Each operator salts with its own
    * prefix so composed decisions decorrelate while each stays
    * deterministic and portable (DuckDB: hash of `'salt' || id`).
    */
  def saltedBucket(salt: String, idCol: Column): Column =
    TextFunctions.hash61(concat(lit(salt), idCol.cast(StringType))) % 1000

  /** Stratified hash sampling: keep each row when its per-mille bucket
    * falls under its stratum's rate — the "downsample the dominant
    * language/source, keep the rare ones" pipeline step. `rates` maps
    * stratum value → keep-per-mille (0-1000); absent strata use
    * `defaultPerMille`.
    *
    * Scale posture: a pure per-row filter on a codegen'd hash — no shuffle,
    * no stratum histogram pass, and the selection is stable under
    * re-partitioning, retries and corpus growth (a kept id stays kept).
    */
  def stratifiedHashSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      rates: Map[String, Int],
      defaultPerMille: Int): DataFrame = {
    require(
      (rates.values ++ Seq(defaultPerMille)).forall(r => r >= 0 && r <= 1000),
      "per-mille rates must be in [0, 1000]")
    val rate = rates.foldLeft(lit(defaultPerMille)) { case (acc, (k, r)) =>
      when(col(strataCol) === lit(k), lit(r)).otherwise(acc)
    }
    df.filter(bucket(col(idCol)) < rate)
  }

  /** Deterministic train/validation/test split: every row is labeled from
    * its salted per-mille hash bucket against cumulative cutoffs —
    * `splits` is an ordered (name, per-mille) list summing to ≤ 1000 (any
    * remainder falls into the LAST split, so the default 980/10/10 is
    * airtight).
    *
    * Hash-assigned splits are the only splits that survive a growing
    * corpus: a document's label depends only on its id, so recrawls and
    * incremental ingests never migrate a training doc into the held-out
    * set (the train-on-test leak a `random()` or row-number split commits
    * on every re-run). The salt decorrelates the split from every other
    * hash-sampling decision in the pipeline (see [[saltedBucket]]).
    *
    * Scale posture: a pure per-row codegen'd projection — no shuffle, no
    * split histogram, stable under re-partitioning and task retries.
    */
  def hashSplit(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Int)] =
        Seq("train" -> 980, "validation" -> 10, "test" -> 10),
      salt: String = "split:"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.forall(_._2 > 0), "per-mille shares must be positive")
    require(splits.map(_._2).sum <= 1000, "per-mille shares must sum to <= 1000")
    val cutoffs = splits.map(_._2).scanLeft(0)(_ + _).tail
    val b = saltedBucket(salt, col(idCol))
    val label = splits.init.zip(cutoffs.init).reverse.foldLeft(
      lit(splits.last._1)) { case (acc, ((name, _), cut)) =>
      when(b < cut, lit(name)).otherwise(acc)
    }
    df.withColumn("split", label)
  }

  /** Deterministic exact-quota sampling: the `k` rows with the smallest
    * salted id hash per stratum (ties broken by id) — the "exactly 10k eval
    * docs per language" step where a rate-based sample's ±binomial noise is
    * not acceptable. Like all hash sampling here it is reproducible
    * run-to-run and engine-to-engine, but NOT stable under corpus growth: a
    * new id can hash under the current cutoff and displace the largest
    * selected hash (inherent to any exact-k selection).
    *
    * Scale posture: one shuffle on the strata columns and a per-stratum
    * sort (rank-k needs an order). For strata too large to sort, prefer
    * [[stratifiedHashSample]] (shuffle-free, rate-based) or pre-filter with
    * it to ~2-3× the quota and quota-sample the survivors.
    */
  def quotaSample(
      df: DataFrame,
      idCol: String,
      k: Int,
      strataCols: Seq[String],
      salt: String = "quota:"): DataFrame = {
    require(k > 0, "quota k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
      .orderBy(
        TextFunctions.hash61(concat(lit(salt), col(idCol).cast(StringType))),
        col(idCol))
    val rn = Iterator
      .from(0)
      .map(i => if (i == 0) "__quota_rn" else s"__quota_rn$i")
      .find(!df.columns.contains(_))
      .get
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= k)
      .drop(rn)
  }

  /** Deterministic weighted corpus mixing: emit each row
    * `weight/1000` times — the "3× books, 0.3× common-crawl" resampling
    * step that turns per-source mixture weights into a physical training
    * corpus. A weight of 2500‰ yields 2 copies of every row plus a third
    * for the 50% of ids whose hash bucket falls under the fraction; weights
    * under 1000‰ degenerate to a w‰ hash downsample. Output carries a
    * 0-based `copyCol` so downstream shuffles can spread replicas.
    *
    * The fractional-copy decision uses a `"mix:"`-[[saltedBucket]], NOT the
    * raw [[bucket]] that [[stratifiedHashSample]] filters on — composing the
    * two on the same id column stays unbiased (an unsalted mix after a
    * sample would re-read the sample's own surviving buckets).
    *
    * Scale posture: a per-row codegen'd hash decides the copy count and
    * `explode(sequence)` emits them map-side — no shuffle, no stratum
    * histogram, stable under repartitioning/retries/corpus growth (same
    * determinism contract as [[stratifiedHashSample]]).
    */
  def weightedMix(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      weightsPerMille: Map[String, Int],
      defaultPerMille: Int,
      copyCol: String = "copy"): DataFrame = {
    require(
      (weightsPerMille.values ++ Seq(defaultPerMille)).forall(_ >= 0),
      "per-mille weights must be non-negative")
    require(
      !df.columns.contains(copyCol),
      s"input already has a column named '$copyCol'; pass a different copyCol")
    val nCol = Iterator
      .from(0)
      .map(i => if (i == 0) "__n_copies" else s"__n_copies$i")
      .find(!df.columns.contains(_))
      .get
    val w = weightsPerMille.foldLeft(lit(defaultPerMille)) {
      case (acc, (k, r)) => when(col(strataCol) === lit(k), lit(r)).otherwise(acc)
    }
    weightedMixCol(df, idCol, w, copyCol, nCol)
  }

  /** [[weightedMix]] with a per-ROW weight COLUMN (per-mille, any
    * non-negative integer — over 1000 upsamples) instead of a static map:
    * the building block for DERIVED-rate mixing where the weights come out
    * of a computation ([[temperatureMix]]) rather than a config.
    */
  def weightedMixCol(
      df: DataFrame,
      idCol: String,
      weightPerMille: Column,
      copyCol: String = "copy"): DataFrame = {
    require(
      !df.columns.contains(copyCol),
      s"input already has a column named '$copyCol'; pass a different copyCol")
    val nCol = Iterator
      .from(0)
      .map(i => if (i == 0) "__n_copies" else s"__n_copies$i")
      .find(!df.columns.contains(_))
      .get
    weightedMixCol(df, idCol, weightPerMille, copyCol, nCol)
  }

  private def weightedMixCol(
      df: DataFrame,
      idCol: String,
      weightPerMille: Column,
      copyCol: String,
      nCol: String): DataFrame = {
    val w = weightPerMille.cast(LongType)
    val frac = pmod(w, lit(1000L))
    // integer arithmetic only (subtract-the-remainder division stays exact)
    val base = ((w - frac) / 1000).cast(LongType)
    val n = base +
      when(saltedBucket("mix:", col(idCol)) < frac, lit(1L)).otherwise(lit(0L))
    df.withColumn(nCol, n)
      .filter(col(nCol) > 0)
      .withColumn(copyCol, explode(sequence(lit(0L), col(nCol) - 1)))
      .drop(nCol)
  }

  /** Temperature-scaled corpus mixing at τ = 2 (square-root weighting —
    * the classic multilingual rebalance: target share of stratum l ∝
    * √n_l, so dominant languages shed mass to the tail without the tail
    * swamping): per-stratum per-mille rates are DERIVED from the corpus's
    * own counts — `rate_l = ⌊1000 · √n_l · N / (Σ√n · n_l)⌋` — and applied
    * through [[weightedMixCol]]. Expected output size ≈ N (the floor
    * under-counts by < 1‰ per stratum).
    *
    * τ is fixed at 2 BY DESIGN: √ is IEEE-exact (correctly rounded) in
    * every engine, so the derived rates are bit-reproducible and the
    * operator hash-gateable, while a general `pow(n, 1/τ)` is only
    * ~1-ulp-accurate libm whose low bits vary by platform. The Σ√n fold
    * runs over the stratum list in STRATUM ORDER (the [[graft.ops]]
    * ordered-fold pattern) — float addition is not associative, a
    * shuffle-order sum would be run-dependent.
    *
    * Scale posture: one partial-agg'd count shuffle over the corpus, a
    * strata-sized (tiny) rate table derived on one row and broadcast
    * back, then the map-side copy explode — no other exchanges.
    */
  def temperatureMix(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      copyCol: String = "copy"): DataFrame = {
    val counts = df
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("__n"))
    // totals via ONE unpartitioned window over the counts frame — counts
    // is strata-sized (a handful of rows at any corpus scale), so the
    // single-partition window is free and avoids a self-joining lineage
    val w = Window.partitionBy()
    val bigN = sum(col("__n")).over(w).cast(DoubleType)
    val sumSqrt = aggregate(
      array_sort(
        collect_list(struct(col(strataCol).as("k"), col("__n").as("n")))
          .over(w)),
      lit(0.0d),
      (acc, x) => acc + sqrt(x.getField("n").cast(DoubleType)))
    val rates = counts
      .select(
        col(strataCol),
        floor(
          (lit(1000.0d) * sqrt(col("__n").cast(DoubleType)) * bigN) /
            (sumSqrt * col("__n").cast(DoubleType)))
          .cast(LongType).as("__permille"))
    weightedMixCol(df.join(broadcast(rates), Seq(strataCol)), idCol,
      col("__permille"), copyCol)
      .drop("__permille")
  }

  /** Shared no-global-sort prefix machinery: range-bucket `base` by
    * `order` (which must be a total order), compute per-bucket sums of
    * `measure` (one row per partition — the only driver-side data), and
    * return the cached bucketed frame, a broadcastable (bucket → prefix
    * offset) frame, and the grand total. Offsets are exclusive prefix
    * sums in bucket order; buckets that received no rows simply don't
    * appear (they contribute nothing and have nothing to join). Used by
    * [[tokenBudgetSelect]] (measure = token count) and [[exactQuantiles]]
    * (measure = 1 → offsets are ranks).
    */
  private[ops] def rangePrefix(
      base: DataFrame,
      order: Seq[Column],
      measure: Column,
      bkt: String,
      offCol: String): (DataFrame, DataFrame, Long) = {
    val ranged = Par.cached(
      base
        .repartitionByRange(order: _*)
        .withColumn(bkt, spark_partition_id()))
    val sums = ranged
      .groupBy(col(bkt))
      .agg(sum(measure).as("s"))
      .collect()
      .map(r => r.getInt(0) -> r.getAs[Number]("s").longValue())
      .sortBy(_._1)
    val scanned = sums.scanLeft((0, 0L)) {
      case ((_, acc), (b, s)) => (b, acc + s)
    }
    val pairs = scanned
      .sliding(2)
      .collect { case Array((_, acc), (b, _)) => (b, acc) }
      .toSeq
    val offsetsDf = base.sparkSession
      .createDataFrame(pairs)
      .toDF(bkt, offCol)
    (ranged, offsetsDf, scanned.last._2)
  }

  /** Exact distributed quantiles of `value` — the "where is the p75 length
    * cap / p10 quality floor" step that thresholds corpus filters. Unlike
    * `approx_percentile` this is EXACT and engine-portable: the selected
    * element is the rank-`max(1, ceil(q*n))` value in the sorted multiset
    * (DuckDB `quantile_disc` semantics, pinned by probe), so the oracle
    * can hash-match.
    *
    * Same no-global-sort machinery as [[tokenBudgetSelect]], summing 1s
    * instead of tokens: `repartitionByRange` on (value, id) buckets the
    * corpus in sort order, per-bucket COUNTS (one row per partition)
    * become broadcast prefix offsets, global rank = offset + bucket-local
    * row_number, and the `qs.size` target ranks are a broadcast join.
    * Null values are excluded (quantile_disc semantics). Output:
    * (`q` DOUBLE, `value`), one row per requested quantile.
    *
    * Prefer binary-exact `q`s (0.25, 0.5, 0.875, ...): `ceil(q*n)` is then
    * integer-exact, immune to last-ulp divergence between engines.
    */
  def exactQuantiles(
      df: DataFrame,
      idCol: String,
      value: Column,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "quantiles must be in [0, 1]")
    val (v, bkt) = ("__eq_v", "__eq_bucket")
    val (ranged, offsetsDf, n) = rangePrefix(
      df.select(col(idCol), value.as(v)).filter(col(v).isNotNull),
      Seq(col(v).asc, col(idCol).asc),
      lit(1L),
      bkt,
      "__eq_offset")
    val targets = df.sparkSession
      .createDataFrame(
        qs.map(q => (q, math.max(1L, math.ceil(q * n).toLong))))
      .toDF("q", "__eq_rank")
    val w = Window.partitionBy(col(bkt)).orderBy(col(v).asc, col(idCol).asc)
    ranged
      .withColumn("__eq_rn", row_number().over(w))
      .join(broadcast(offsetsDf), bkt)
      .withColumn("__eq_rank", col("__eq_offset") + col("__eq_rn"))
      .join(broadcast(targets), "__eq_rank")
      .select(col("q"), col(v).as("value"))
  }

  /** Deterministic k-fold assignment — cross-validation / ensembling fold
    * labels with EXACT balance: within each stratum, rows order by a
    * keyed hash and fold = (rank − 1) mod k, so every (stratum, fold)
    * cell holds ⌊n_s/k⌋ or ⌈n_s/k⌉ rows — no binomial imbalance, and the
    * assignment is reproducible run-to-run, engine-to-engine, and
    * re-derivable after corpus edits only for the strata that changed.
    * The hash-modulo shortcut (`hash % k`) gives folds balanced only in
    * expectation; eval folds want exact counts (the P29 quota argument).
    *
    * Scale posture: one shuffle on the strata key + per-stratum windows
    * (the P38 per-group-window trade); with NO strata the rank rides the
    * [[rangePrefix]] no-global-sort machinery instead of a single-task
    * global window. Output: input columns + `fold` (0-based INT).
    */
  def kFolds(
      df: DataFrame,
      idCol: String,
      k: Int,
      strataCols: Seq[String] = Nil,
      seed: String = "fold"): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val helpers = Seq("__kf_h", "__kf_bkt", "__kf_off", "fold")
    require(
      !df.columns.exists(helpers.contains),
      s"input must not contain ${helpers.mkString("/")}")
    val base = df.withColumn(
      "__kf_h",
      TextFunctions.hash61(
        concat(lit(seed + ":"), col(idCol).cast("string"))))
    if (strataCols.nonEmpty) {
      val w = Window
        .partitionBy(strataCols.map(col): _*)
        .orderBy(col("__kf_h").asc, col(idCol).asc)
      base
        .withColumn(
          "fold",
          ((row_number().over(w) - 1) % k).cast(IntegerType))
        .drop("__kf_h")
    } else {
      val order = Seq(col("__kf_h").asc, col(idCol).asc)
      val (ranged, offsets, _) =
        rangePrefix(base, order, lit(1L), "__kf_bkt", "__kf_off")
      val w = Window.partitionBy(col("__kf_bkt")).orderBy(order: _*)
      ranged
        .join(broadcast(offsets), Seq("__kf_bkt"))
        .withColumn(
          "fold",
          pmod(col("__kf_off") + row_number().over(w) - 1, lit(k.toLong))
            .cast(IntegerType))
        .drop("__kf_h", "__kf_bkt", "__kf_off")
    }
  }

  /** Tukey IQR outlier filter — the classic "drop rows whose `value` falls
    * outside `[Q1 − k·IQR, Q3 + k·IQR]`" corpus gate (length outliers,
    * token-count explosions, degenerate near-empty docs) with EXACT,
    * engine-portable fences: quartiles come from [[exactQuantiles]]
    * (rank-selected elements, not interpolations) and `k` multiplies
    * exact integers into one correctly-rounded double per fence. The
    * default k = 1.5 is binary-exact (3/2), so both engines compute
    * bit-identical bounds. Keeps null values out (they have no order).
    *
    * Scale posture: the two-quantile pass is the [[exactQuantiles]]
    * no-global-sort machinery; the fences are a 1-row broadcast into a
    * map-side filter — the corpus itself never shuffles.
    */
  def iqrFilter(
      df: DataFrame,
      idCol: String,
      value: Column,
      k: Double = 1.5): DataFrame = {
    require(k >= 0, "k must be >= 0")
    require(
      !df.columns.exists(Seq("__iqr_lo", "__iqr_hi").contains),
      "input must not contain __iqr_lo/__iqr_hi")
    val quartiles = exactQuantiles(df, idCol, value, Seq(0.25, 0.75))
    val fences = quartiles
      .agg(
        min(when(col("q") === 0.25, col("value"))).as("__q1"),
        min(when(col("q") === 0.75, col("value"))).as("__q3"))
      .select(
        (col("__q1").cast(DoubleType) -
          lit(k) * (col("__q3") - col("__q1")).cast(DoubleType))
          .as("__iqr_lo"),
        (col("__q3").cast(DoubleType) +
          lit(k) * (col("__q3") - col("__q1")).cast(DoubleType))
          .as("__iqr_hi"))
    df.crossJoin(broadcast(fences))
      .filter(
        value.isNotNull &&
          value.cast(DoubleType) >= col("__iqr_lo") &&
          value.cast(DoubleType) <= col("__iqr_hi"))
      .drop("__iqr_lo", "__iqr_hi")
  }

  /** Per-GROUP exact quantiles (per-language length caps, per-source
    * quality floors): same rank-selection semantics as [[exactQuantiles]]
    * — within each group the result is the rank-`max(1, ceil(q·n_g))`
    * value — but fully declarative: ONE shuffle on the group key, interior
    * rank and group size as group-partitioned windows, quantile targets as
    * a map-side explode + filter (no driver-side pass at all). A single
    * pathologically large group serializes on one window task — slice it
    * through [[exactQuantiles]] instead; across many groups (the
    * per-language/per-source shape) this parallelizes on the group key.
    * Output: (groupCols..., `q` DOUBLE, `value`), one row per (group, q).
    */
  def groupQuantiles(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      value: Column,
      qs: Seq[Double]): DataFrame = {
    require(groupCols.nonEmpty, "groupQuantiles needs at least one group col")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "quantiles must be in [0, 1]")
    val v = "__gq_v"
    val base = df
      .select(groupCols.map(col) ++ Seq(col(idCol), value.as(v)): _*)
      .filter(col(v).isNotNull)
    val rankW = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(v).asc, col(idCol).asc)
    val sizeW = Window.partitionBy(groupCols.map(col): _*)
    base
      .withColumn("__gq_rn", row_number().over(rankW))
      .withColumn("__gq_n", count(lit(1)).over(sizeW))
      .withColumn("q", explode(array(qs.map(lit(_)): _*)))
      .filter(col("__gq_rn") ===
        greatest(lit(1L), ceil(col("q") * col("__gq_n"))))
      .select(groupCols.map(col) ++ Seq(col("q"), col(v).as("value")): _*)
  }

  /** Per-group winsorization: clamp `value` into its group's exact
    * [`pLo`, `pHi`] quantile interval ([[groupQuantiles]] semantics —
    * rank `max(1, ⌈q·n_g⌉)`). The standard robustification of a quality
    * score before mixture weighting: a handful of pathological outliers
    * (a 10 MB doc, a score overflow) otherwise drags any mean-normalized
    * downstream weighting. Clipping — not dropping — preserves row count:
    * every input row survives with `clippedCol` appended.
    *
    * Scale posture: the bounds frame is one row per group — broadcast
    * back into a map-side clamp; the quantile pass itself is
    * [[groupQuantiles]]' one group-keyed shuffle. Exact: with integer
    * scores everything stays integer (clamp = least/greatest, no
    * arithmetic), so results are partitioning- and engine-deterministic.
    */
  def winsorize(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      value: Column,
      pLo: Double,
      pHi: Double,
      clippedCol: String = "clipped"): DataFrame = {
    require(pLo >= 0.0 && pHi <= 1.0 && pLo < pHi, "need 0 <= pLo < pHi <= 1")
    val bounds = groupQuantiles(df, groupCols, idCol, value, Seq(pLo, pHi))
      .groupBy(groupCols.map(col): _*)
      .agg(
        min(when(col("q") === pLo, col("value"))).as("__w_lo"),
        min(when(col("q") === pHi, col("value"))).as("__w_hi"))
    df.join(broadcast(bounds), groupCols)
      .withColumn(
        clippedCol,
        least(greatest(value, col("__w_lo")), col("__w_hi")))
      .drop("__w_lo", "__w_hi")
  }

  /** Token-budget corpus selection: keep the best documents — by `score`
    * descending, ties broken on `idCol` — until their cumulative token
    * count fills `budget`; the first document that would overflow the
    * budget, and everything after it, is dropped. The "take the
    * highest-quality B tokens" curation step that turns a scored corpus
    * plus a training-compute budget into a dataset. Appends `cumCol` (the
    * kept row's global cumulative token count) to the input columns.
    *
    * The global cumulative sum is computed WITHOUT a single-task sort (see
    * [[rangePrefix]]): range buckets in selection order, broadcast prefix
    * offsets, bucket-partitioned interior window. The result is exact and
    * deterministic: the (score desc, id) order is total, so neither
    * range-boundary sampling nor partition count affects which documents
    * are kept or their `cumCol` values. Rows whose token count evaluates
    * NULL or negative are EXCLUDED — a null text's `tokenCount` (or
    * `size(null)` = −1 under non-ANSI semantics) would otherwise corrupt
    * the monotone prefix, and SQL engines drop such rows the same way
    * (`len(NULL)` is NULL).
    */
  /** Per-GROUP token-budget selection — the MIXTURE-building cut: each
    * source/language gets its own token budget ("300B tokens of web, 30B
    * of code, 10B of de/fr/zh"), where [[tokenBudgetSelect]] cuts one
    * global budget. Keep rule per group mirrors the global operator:
    * within its group, order by (`score` desc, `idCol` asc) and keep every
    * row whose running token total INCLUDING itself is ≤ that group's
    * budget; null/negative token rows are excluded the same way. Groups
    * absent from `budgets` are dropped entirely (a budget of zero).
    * Appends `cumCol` = the row's within-group cumulative token count.
    *
    * Scale posture (the P38-vs-P37 split): fully declarative with ONE
    * shuffle on the group key — the cumsum is a group-partitioned window,
    * and the budget map (a handful of sources/languages) joins BROADCAST
    * before the exchange. A pathologically hot single group (one source =
    * 90% of 100 TB) serializes that group's window onto one task chain —
    * slice it through the global [[tokenBudgetSelect]]'s range-bucket
    * machinery instead (scaladoc'd trade-off, same answer).
    */
  def groupTokenBudget(
      df: DataFrame,
      idCol: String,
      tokens: Column,
      score: Column,
      groupCol: String,
      budgets: Map[String, Long],
      cumCol: String = "cum_tokens"): DataFrame = {
    require(budgets.nonEmpty, "budgets must be non-empty")
    require(
      !df.columns.contains(cumCol),
      s"input already has a column named '$cumCol'; pass a different cumCol")
    val spark = df.sparkSession
    import spark.implicits._
    val budgetDf =
      budgets.toSeq.sorted.toDF("__gb_key", "__gb_budget")
    val (tok, sc) = ("__gb_tok", "__gb_score")
    val w = Window
      .partitionBy(col(groupCol))
      .orderBy(col(sc).desc, col(idCol).asc)
    df.withColumn(tok, tokens)
      .withColumn(sc, score)
      .filter(col(tok).isNotNull && col(tok) >= 0)
      .join(broadcast(budgetDf), col(groupCol) === col("__gb_key"))
      .withColumn(cumCol, sum(col(tok)).over(w))
      .filter(col(cumCol) <= col("__gb_budget"))
      .drop(tok, sc, "__gb_key", "__gb_budget")
  }

  def tokenBudgetSelect(
      df: DataFrame,
      idCol: String,
      tokens: Column,
      score: Column,
      budget: Long,
      cumCol: String = "cum_tokens"): DataFrame = {
    require(
      !df.columns.contains(cumCol),
      s"input already has a column named '$cumCol'; pass a different cumCol")
    val (tok, sc, bkt) = ("__tb_tok", "__tb_score", "__tb_bucket")
    val (ranged, offsetsDf, _) = rangePrefix(
      df.withColumn(tok, tokens)
        .withColumn(sc, score)
        .filter(col(tok).isNotNull && col(tok) >= 0),
      Seq(col(sc).desc, col(idCol).asc),
      col(tok),
      bkt,
      "__tb_offset")
    val w = Window
      .partitionBy(col(bkt))
      .orderBy(col(sc).desc, col(idCol).asc)
    ranged
      .withColumn("__tb_local", sum(col(tok)).over(w))
      .join(broadcast(offsetsDf), bkt)
      .withColumn(cumCol, col("__tb_offset") + col("__tb_local"))
      .filter(col(cumCol) <= budget)
      .drop(tok, sc, bkt, "__tb_local", "__tb_offset")
  }

  /** Exact integer division `⌊a / b⌋` for non-negative longs — true
    * integer division ([[RangeJoin.floorDiv]]'s `IntegralDivide`), exact
    * past 2^53 where a double round-trip is not: `budget · share` at a
    * 10-trillion-token budget already overflows double exactness.
    */
  def divFloor(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graft.ColumnShim.expression(a.cast(LongType)),
        org.apache.spark.sql.graft.ColumnShim.expression(b.cast(LongType))))

  /** Per-group rank normalization — map a raw score onto [0, 10⁶] by its
    * rank WITHIN the group (`rank_ppm = ⌊r·10⁶ / max(n−1, 1)⌋`, r the
    * 0-based (score, id) rank): the calibration step that makes a quality
    * score comparable ACROSS languages/sources whose raw score
    * distributions differ (CCNet's per-language percentile bucketing is
    * this op + a CASE). Deterministic and engine-exact when `score` is an
    * integer column (ties broken by id); single-member groups map to 0.
    *
    * Scale posture: one exchange on the group key + a per-group
    * sort/window and a broadcast of the |groups|-row count table — the
    * [[groupQuantiles]] shape. Groups are assumed corpus-fraction-sized
    * (languages, sources); for a single giant group use the global
    * [[rangePrefix]] machinery instead.
    */
  def rankNormalize(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      score: Column,
      outCol: String = "rank_ppm"): DataFrame = {
    require(groupCols.nonEmpty, "rankNormalize needs at least one group col")
    val helpers = Seq("__rn_s", "__rn_n", "__rn_r")
    require(
      !df.columns.exists(helpers.contains) && !df.columns.contains(outCol),
      s"input must not contain ${(helpers :+ outCol).mkString("/")}")
    val base = df.withColumn("__rn_s", score)
    val counts = base
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__rn_n"))
    val w = Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("__rn_s").asc, col(idCol).asc)
    base
      .join(broadcast(counts), groupCols)
      .withColumn("__rn_r", row_number().over(w).cast(LongType) - 1L)
      .withColumn(
        outCol,
        divFloor(
          col("__rn_r") * 1000000L,
          greatest(col("__rn_n") - 1L, lit(1L))))
      .drop("__rn_s", "__rn_n", "__rn_r")
  }

  /** Systematic probability-proportional-to-size sampling — the classic
    * survey-sampling design (fixed stride over a cumulative-weight axis in
    * a pseudorandom order): EXACTLY `k` selection points, every row's
    * selection probability proportional to its weight, zero variance in
    * the sample size. The "pick 10M documents, long ones
    * proportionally more often" step where a Bernoulli/hash sample's
    * binomial size jitter is unacceptable.
    *
    * Deterministic and engine-exact: rows are ordered by
    * (hash61(seed:id), id); with exclusive prefix weight `W_i` and total
    * `T`, row i is hit by selection points `⌊(W_i+w_i)·k/T⌋ − ⌊W_i·k/T⌋`
    * (crossings of the T/k grid — pure integer arithmetic, no floats), so
    * `Σ hits = k` exactly and a row with weight > T/k is hit multiple
    * times (`n_hits` is its replication count in the sample, the standard
    * PPS-with-certainty outcome). Output: selected rows with `n_hits`.
    *
    * Scale posture: same no-global-sort [[rangePrefix]] machinery as
    * [[exactQuantiles]] — range partition by the hash key, broadcast
    * per-bucket prefix offsets, bucket-local windows; one driver scalar
    * (the total). Overflow-guarded loudly: requires `T·k` to fit a long
    * (ANSI would throw anyway; the require names the fix).
    */
  def systematicSample(
      df: DataFrame,
      idCol: String,
      weight: Column,
      k: Long,
      seed: String = "pps"): DataFrame = {
    require(k > 0, "k must be positive")
    val helpers = Seq("__ss_w", "__ss_h", "__ss_bkt", "__ss_off", "__ss_cum")
    require(
      !df.columns.exists(helpers.contains),
      s"input must not contain ${helpers.mkString("/")}")
    val base = df
      .withColumn("__ss_w", weight.cast(LongType))
      .filter(col("__ss_w").isNotNull && col("__ss_w") > 0)
      .withColumn(
        "__ss_h",
        TextFunctions.hash61(
          concat(lit(seed + ":"), col(idCol).cast(StringType))))
    val (ranged, offsetsDf, total) = rangePrefix(
      base,
      Seq(col("__ss_h").asc, col(idCol).asc),
      col("__ss_w"),
      "__ss_bkt",
      "__ss_off")
    require(total > 0, "total weight must be positive")
    require(
      total <= Long.MaxValue / k,
      s"T*k overflows a long (T=$total, k=$k): scale weights down")
    val w = Window
      .partitionBy(col("__ss_bkt"))
      .orderBy(col("__ss_h").asc, col(idCol).asc)
    ranged
      .withColumn("__ss_cum", sum(col("__ss_w")).over(w))
      .join(broadcast(offsetsDf), Seq("__ss_bkt"))
      .withColumn(
        "n_hits",
        divFloor((col("__ss_off") + col("__ss_cum")) * k, lit(total)) -
          divFloor(
            (col("__ss_off") + col("__ss_cum") - col("__ss_w")) * k,
            lit(total)))
      .filter(col("n_hits") > 0)
      .drop("__ss_w", "__ss_h", "__ss_bkt", "__ss_off", "__ss_cum")
  }

  /** Mixture plan: turn measured per-group token counts (the
    * [[CorpusStats.corpusReport]] output, or any (group, tokens) frame)
    * plus TARGET mixture shares and a total token budget into the
    * per-group sampling rates [[weightedMixCol]] consumes — the "design
    * the mixture" step between corpus accounting and corpus sampling.
    *
    * For each group: `desired = ⌊budget · share‰ / 1000⌋` tokens, rate =
    * `⌊desired · 1000 / tokens⌋` per-mille capped at `maxPerMille`
    * (1000 = downsample-only; higher permits upsampling — duplication —
    * for under-represented groups), and `planned = ⌊tokens · rate / 1000⌋`
    * actually-sampled tokens. All integer arithmetic: the plan is
    * deterministic, engine-replayable, and auditable (planned ≤ desired,
    * with equality gaps only from per-mille granularity). Zero-token
    * groups get rate 0.
    *
    * Output: (groupCol, tokens, target_per_mille, rate_per_mille,
    * planned_tokens). Pure projection over the (small) stats frame — no
    * shuffle; at 100 TB the stats frame is |groups| rows, the plan is the
    * same |groups| rows broadcast into the sampling pass.
    */
  def mixturePlan(
      stats: DataFrame,
      groupCol: String,
      tokenCol: String,
      targetsPerMille: Map[String, Int],
      defaultPerMille: Int,
      budget: Long,
      maxPerMille: Int = 1000): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    require(maxPerMille >= 0, "maxPerMille must be non-negative")
    require(
      (targetsPerMille.values ++ Seq(defaultPerMille)).forall(_ >= 0),
      "target shares must be non-negative")
    // overflow guard — the scaladoc promises EXACT integer arithmetic, so
    // a silent 64-bit wrap must be a loud driver-side error, not a wrong
    // plan. budget·maxShare ≤ Long.Max suffices for BOTH products:
    // desired·1000 = ⌊budget·share/1000⌋·1000 ≤ budget·share. (A
    // 9.2-quadrillion-token budget at share 1000‰ stays legal.)
    val maxShare =
      math.max(1L, (targetsPerMille.values ++ Seq(defaultPerMille)).max.toLong)
    require(
      budget <= Long.MaxValue / maxShare,
      s"budget $budget with max share $maxShare‰ would overflow 64-bit " +
        s"budget·share (cap ${Long.MaxValue / maxShare})")
    val share = targetsPerMille.foldLeft(lit(defaultPerMille.toLong)) {
      case (acc, (k, s)) =>
        when(col(groupCol) === lit(k), lit(s.toLong)).otherwise(acc)
    }
    val tokens = coalesce(col(tokenCol).cast(LongType), lit(0L))
    val desired = divFloor(lit(budget) * share, lit(1000L))
    val rawRate =
      when(tokens === 0L, lit(0L))
        .otherwise(divFloor(desired * 1000L, tokens))
    val rate = least(rawRate, lit(maxPerMille.toLong))
    // tokens is data-dependent, so its overflow guard must be in-plan:
    // raise_error (not a wrapped product) if tokens·rate would exceed a
    // long. The stats frame is |groups| rows, so the per-row CASE is free.
    val tokenCap = Long.MaxValue / math.max(1L, maxPerMille.toLong)
    val checkedTokens = when(
      tokens > tokenCap,
      raise_error(concat(
        lit(s"mixturePlan: token count exceeds overflow-safe cap $tokenCap: "),
        tokens.cast(StringType))).cast(LongType)).otherwise(tokens)
    stats
      .select(
        col(groupCol),
        tokens.as("tokens"),
        share.as("target_per_mille"),
        rate.as("rate_per_mille"),
        divFloor(checkedTokens * rate, lit(1000L)).as("planned_tokens"))
  }

  /** Largest-remainder (Hamilton) apportionment: split EXACTLY `total`
    * integer slots across groups proportional to a weight — shard counts
    * per source, eval-question quotas per category, per-language sampling
    * budgets. Floor shares `⌊total·w_g/T⌋` under-allocate by
    * `total − Σ floors < |groups|` slots; those go to the groups with the
    * largest remainders `total·w_g mod T` (ties: group ascending) — the
    * unique allocation with every group within 1 slot of its exact
    * proportional share and the total landing EXACTLY on `total`
    * ([[mixturePlan]] plans per-row RATES and cannot promise an exact
    * total; this is the per-group exact-total complement).
    *
    * Output: (`group`, `weight`, `floor_alloc`, `extra`, `n_alloc`) — all
    * exact integers, `Σ n_alloc = total` whenever `T > 0`.
    *
    * Scale posture: one partial-agg'd shuffle to the per-group weight
    * relation (the only row-count-sized pass), a 1-row total broadcast,
    * and one window over the GROUP relation (bounded by the group count —
    * languages/sources/shards, never corpus-sized). Overflow-guarded
    * loudly: `total·w_g` must fit a long; the weight cap is in-plan
    * (data-dependent), the total cap a require.
    */
  def apportion(
      df: DataFrame,
      groupCol: String,
      weight: Column,
      total: Long): DataFrame = {
    require(total >= 0, "total must be non-negative")
    require(total <= 1000000000000L, "total above 1e12 risks weight overflow")
    val byGroup = Par.fan(df)
      .groupBy(col(groupCol))
      .agg(sum(greatest(weight.cast(LongType), lit(0L))).as("weight"))
    val weightCap = Long.MaxValue / math.max(1L, total)
    val w = when(
      col("weight") > weightCap,
      raise_error(concat(
        lit(s"apportion: group weight exceeds overflow-safe cap $weightCap: "),
        col("weight").cast(StringType))).cast(LongType))
      .otherwise(col("weight"))
    val tot = byGroup.agg(sum(col("weight")).as("__t"))
    val shares = byGroup
      .crossJoin(broadcast(tot))
      .select(
        col(groupCol),
        col("weight"),
        col("__t"),
        when(col("__t") === 0, lit(0L))
          .otherwise(divFloor(w * lit(total), col("__t")))
          .as("floor_alloc"),
        when(col("__t") === 0, lit(0L))
          .otherwise(w * lit(total) - divFloor(w * lit(total), col("__t")) * col("__t"))
          .as("__rem"))
    // T = 0 means no proportionality basis: allocate nothing (documented)
    val need = shares
      .agg(
        when(coalesce(max(col("__t")), lit(0L)) === 0, lit(0L))
          .otherwise(lit(total) - coalesce(sum(col("floor_alloc")), lit(0L)))
          .as("__need"))
    val byRem = org.apache.spark.sql.expressions.Window
      .orderBy(col("__rem").desc, col(groupCol).asc)
    shares
      .drop("__t")
      .crossJoin(broadcast(need))
      .withColumn("__rank", row_number().over(byRem))
      .select(
        col(groupCol),
        col("weight"),
        col("floor_alloc"),
        when(col("__rank") <= col("__need"), lit(1L)).otherwise(lit(0L))
          .as("extra"),
        (col("floor_alloc") +
          when(col("__rank") <= col("__need"), lit(1L)).otherwise(lit(0L)))
          .as("n_alloc"))
  }
}
