package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Integer-exact IVF: coarse-quantized ANN whose TRAINING is deterministic
  * and engine-replayable, not just its assignment step.
  *
  * The float k-means behind [[Similarity.ivfTopK]] composes float sums
  * whose value depends on reduction order, so its driver gate can only
  * check rows+schema. This variant runs the whole pipeline — seeding,
  * k-means iterations, assignment, probe, ranking — over int8-quantized
  * codes ([[Quantize]]) with arithmetic restricted to exact integers and
  * correctly-rounded IEEE double ops (`x/sqrt(y)` of exact ints), so every
  * intermediate is bit-identical under any partitioning AND in the DuckDB
  * oracle: the training itself is hash-gateable.
  *
  * Semantics (pinned by spec + gate):
  *   - codes/scales per [[Quantize.quantize]]; norms `n2 = Σ q_i²` exact
  *     longs; cosine over codes is scale-free ([[Quantize.intCosine]]).
  *   - seeds = the `cells` vectors with the smallest
  *     ([[TextFunctions.hash61]](id), id-string) — a deterministic seeded
  *     sample (the [[Similarity.seededCentroids]] rule, code-space).
  *   - assignment: argmax over cells of `dot(q, c) / √(Σ c_i²)` (the
  *     per-vector norm is cell-constant, so this IS cosine argmax); a
  *     zero-norm centroid scores 0.0; ties take the lowest cell id.
  *   - update: `c_d ← ⌊Σ q_d / n⌋` per assigned dimension — floor of an
  *     exact-integer ratio (the double division is correctly rounded and
  *     the ratio's distance to any integer is ≥ 1/n ≫ ulp, so the floor is
  *     exact); empty cells carry their previous centroid.
  *
  * Scale posture (100 TB): the quantized projection (id, q, n2) is cached
  * for the bounded iteration count — codes are 4× smaller than the float
  * column, and each iteration is ONE map-side assignment (centroids
  * broadcast as literals) + ONE partial-agg'd shuffle of (cell, dim)
  * partial sums; the driver materializes only cells×dim rows per
  * iteration. Search is the [[Similarity.ivfTopK]] plan: probe cells
  * broadcast, candidate set |corpus|·nprobe/cells, one top-k window keyed
  * by query.
  */
object IvfInt {

  /** Quantized corpus projection: (`idCol`, q: array<int>, n2: long). */
  def quantizedWithNorm(
      df: DataFrame,
      idCol: String,
      vecCol: String): DataFrame =
    Quantize
      .quantize(df, idCol, vecCol)
      .select(
        col(idCol),
        col("q"),
        Quantize.intDot(col("q"), col("q")).as("n2"))

  /** The `cells` seed codes by (hash61(id), id-string) order — bounded
    * collect (`cells` rows).
    */
  def seededCodes(
      quantized: DataFrame,
      idCol: String,
      cells: Int): Array[Array[Int]] = {
    require(cells > 0, "cells must be positive")
    quantized
      .select(col(idCol).cast(StringType).as("__id"), col("q"))
      .withColumn("__h", TextFunctions.hash61(col("__id")))
      .orderBy(col("__h").asc, col("__id").asc)
      .limit(cells)
      .collect()
      .map(_.getSeq[Int](1).toArray)
  }

  /** Per-cell assignment scores `dot(q,c)/√(Σc²)` as an array column —
    * centroids broadcast as literals, one codegen'd pass.
    */
  private def cellScores(
      centroids: Array[Array[Int]],
      q: Column): Column =
    array(centroids.map { cv =>
      val n2c = cv.foldLeft(0L)((a, v) => a + v.toLong * v)
      if (n2c == 0L) lit(0.0d)
      else
        Quantize.intDot(q, typedlit(cv.toSeq)).cast(DoubleType) /
          lit(math.sqrt(n2c.toDouble))
    }: _*)

  /** Argmax cell (ties → lowest id) for a code column. */
  private def bestCell(
      centroids: Array[Array[Int]],
      q: Column): Column = {
    val scores = cellScores(centroids, q)
    (array_position(scores, array_max(scores)) - 1).cast(IntegerType)
  }

  /** `iters` integer-exact k-means rounds from the seeded codes. The
    * quantized frame is evaluated once per iteration (callers pass a
    * [[Par.cached]] projection when iterating more than once).
    */
  def trainCodes(
      quantized: DataFrame,
      idCol: String,
      cells: Int,
      iters: Int): Array[Array[Int]] = {
    var cent = seededCodes(quantized, idCol, cells)
    val dim = cent.headOption.map(_.length).getOrElse(0)
    for (_ <- 0 until iters) {
      val sums = quantized
        .select(bestCell(cent, col("q")).as("__cell"),
          posexplode(col("q")).as(Seq("__d", "__v")))
        .groupBy(col("__cell"), col("__d"))
        .agg(
          sum(col("__v").cast(LongType)).as("__s"),
          count(lit(1)).as("__n"))
        .collect()
      val next = cent.map(_.clone()) // empty cells carry over
      sums.foreach { r =>
        val (ci, d) = (r.getInt(0), r.getInt(1))
        val (s, n) = (r.getLong(2), r.getLong(3))
        next(ci)(d) = math.floor(s.toDouble / n.toDouble).toInt
      }
      cent = next
    }
    cent
  }

  /** Trained centroids as a gateable frame: (cell, dim, value) — exact
    * integers, one row per (cell, dimension).
    */
  def trainedCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      cells: Int,
      iters: Int): DataFrame = {
    val spark = corpus.sparkSession
    val quant = Par.cached(Par.fan(quantizedWithNorm(corpus, idCol, vecCol)))
    val cent = trainCodes(quant, idCol, cells, iters)
    centroidFrame(spark, cent)
  }

  private[ops] def centroidFrame(
      spark: SparkSession,
      cent: Array[Array[Int]]): DataFrame = {
    val rows = for {
      (cv, ci) <- cent.zipWithIndex
      (v, d) <- cv.zipWithIndex
    } yield Row(ci, d, v)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(
        StructField("cell", IntegerType, nullable = false),
        StructField("dim", IntegerType, nullable = false),
        StructField("value", IntegerType, nullable = false))))
  }

  /** Integer-exact IVF top-k: train on the corpus codes, assign corpus
    * vectors map-side, probe each query's `nprobe` best cells, rank exact
    * quantized cosine within the probed cells. Output:
    * (query_id, neighbor_id, rank, qcos) — every value engine-replayable.
    */
  def topK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int,
      cells: Int = 16,
      nprobe: Int = 4,
      iters: Int = 2): DataFrame = {
    val quant = Par.cached(
      Par.fan(quantizedWithNorm(corpus, corpusId, corpusVec)))
    val cent = trainCodes(quant, corpusId, cells, iters)

    val c = quant.select(
      col(corpusId).as("neighbor_id"),
      col("q").as("__cq"),
      col("n2").as("__cn2"),
      bestCell(cent, col("q")).as("__cell"))

    val qn = quantizedWithNorm(queries, queryId, queryVec).select(
      col(queryId).as("query_id"),
      col("q").as("__qq"),
      col("n2").as("__qn2"))
    val qScored = qn.select(
      col("query_id"),
      col("__qq"),
      col("__qn2"),
      posexplode(cellScores(cent, col("__qq"))).as(Seq("__cell", "__score")))
    val pw = Window
      .partitionBy(col("query_id"))
      .orderBy(col("__score").desc, col("__cell").asc)
    val qCells = qScored
      .withColumn("__crank", row_number().over(pw))
      .filter(col("__crank") <= nprobe)
      .select(col("query_id"), col("__qq"), col("__qn2"), col("__cell"))

    val scored = c
      .join(broadcast(qCells), Seq("__cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn(
        "qcos",
        Quantize.intCosine(
          col("__qq"), col("__cq"), col("__qn2"), col("__cn2")))
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("qcos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("qcos"))
  }
}
