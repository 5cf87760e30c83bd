package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-space outlier detection — the "drop mislabeled / off-topic /
  * garbage vectors before training" curation step (e.g. filtering a
  * contrastive-training corpus to vectors that cohere with their class).
  *
  * A vector is an outlier when its cosine to its group's centroid falls
  * below a threshold. The twist that makes this GATEABLE (hash-exact,
  * engine-portable) where naive implementations are not: float centroids
  * are shuffle-order-dependent (non-associative addition), so instead the
  * whole decision is computed in EXACT INTEGER arithmetic over int8 codes:
  *
  *   1. each vector is int8-quantized (the pinned [[Quantize]] contract);
  *   2. the group centroid is the per-dimension INTEGER SUM of codes —
  *      order-free and exact, unlike a float mean (cosine is
  *      scale-invariant, so the sum IS the mean direction);
  *   3. the summed centroid is itself requantized to int8 (keeps every
  *      later product far inside 38-digit decimals at ANY group size);
  *   4. keep iff cos(v, c) ≥ num/den, decided exactly as
  *      `dot > 0 ∧ dot²·den² ≥ num²·|v|²·|c|²` in DECIMAL(38,0) —
  *      no sqrt, no division, no floats anywhere in the decision.
  *
  * Scale posture: quantization and the final predicate are per-row codegen;
  * the centroid is one partial-agg'd shuffle of (group, dim, code) rows
  * (dim × groups cells total); centroids broadcast back (one short row per
  * group). No collects, no windows, no cross joins.
  */
object Outliers {

  /** Flag every row of `df` with its exact centroid-cosine decision.
    * Output: (`idCol`, `groupCols`…, `cdot`, `nv`, `nc`, `is_outlier`)
    * where `cdot` = integer code·centroid dot, `nv`/`nc` the squared
    * integer norms, and `is_outlier` = cos(v, centroid) < num/den decided
    * exactly. Empty `groupCols` = one global centroid. The zero vector is
    * always an outlier (its cosine is undefined; `cdot = 0` fails the
    * `dot > 0` test).
    */
  def centroidOutliers(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      groupCols: Seq[String],
      thresholdNum: Long,
      thresholdDen: Long): DataFrame = {
    require(thresholdNum > 0 && thresholdDen > 0,
      s"threshold must be a positive rational (got $thresholdNum/$thresholdDen)")
    val gcols = if (groupCols.isEmpty) Seq("__g") else groupCols
    val withG =
      if (groupCols.isEmpty) Par.fan(df).withColumn("__g", lit(1))
      else Par.fan(df)
    // staged projections so the single array_max fold is not re-inlined
    // per reference (the Quantize.quantize pattern)
    val codes = withG
      .select(
        (col(idCol) +: gcols.map(col)) :+
          col(vecCol).as("__v"): _*)
      .withColumn(
        "__maxabs",
        array_max(transform(col("__v"), x => abs(x.cast(DoubleType)))))
      .withColumn(
        "__scale",
        when(col("__maxabs") === lit(0.0d), lit(1.0d))
          .otherwise(col("__maxabs") / lit(127.0d)))
      .select(
        (col(idCol) +: gcols.map(col)) :+
          Quantize.int8Codes(col("__v"), col("__scale")).as("__q"): _*)
    // groupBy twice: per-dim sums first, then assembly — both partial-agg
    val dims = codes
      .select(gcols.map(col) :+ posexplode(col("__q")).as(Seq("__i", "__c")): _*)
      .groupBy(gcols.map(col) :+ col("__i"): _*)
      .agg(sum(col("__c")).as("__s"))
    val centroid = dims
      .groupBy(gcols.map(col): _*)
      .agg(
        transform(
          array_sort(collect_list(struct(col("__i"), col("__s")))),
          x => x.getField("__s")).as("__cent"))
      .withColumn(
        "__cmax",
        array_max(transform(col("__cent"), x => abs(x.cast(DoubleType)))))
      .withColumn(
        "__cscale",
        when(col("__cmax") === lit(0.0d), lit(1.0d))
          .otherwise(col("__cmax") / lit(127.0d)))
      .select(
        gcols.map(col) :+
          Quantize.int8Codes(col("__cent"), col("__cscale")).as("__cq"): _*)
    val dec = DecimalType(38, 0)
    def d38(c: Column): Column = c.cast(dec)
    val joined = codes.join(broadcast(centroid), gcols)
    val cdot = Quantize.intDot(col("__q"), col("__cq"))
    val nv = Quantize.intDot(col("__q"), col("__q"))
    val nc = Quantize.intDot(col("__cq"), col("__cq"))
    joined
      .select(
        (col(idCol) +: groupCols.map(col)) ++ Seq(
          cdot.as("cdot"),
          nv.as("nv"),
          nc.as("nc")): _*)
      .withColumn(
        "is_outlier",
        !(col("cdot") > 0 &&
          d38(col("cdot")) * d38(col("cdot")) *
            d38(lit(thresholdDen)) * d38(lit(thresholdDen)) >=
            d38(lit(thresholdNum)) * d38(lit(thresholdNum)) *
              d38(col("nv")) * d38(col("nc"))))
  }
}
