package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product quantization (Jégou et al. 2011) — the standard memory-scale
  * path for billion-vector similarity search: split each vector into `m`
  * contiguous subvectors, k-means each subspace into `cells` centroids,
  * store each vector as `m` small cell ids (bytes, not floats), and score
  * queries against codes via ADC (asymmetric distance computation: a
  * per-query lookup table of subspace dot products, summed by code).
  * At 100 TB this turns a 256-byte float embedding into `m` bytes plus a
  * shared codebook — the difference between "vectors fit in executor
  * memory" and "they do not".
  *
  * Integer-exact throughout (the [[IvfInt]] discipline, taken further —
  * NO floating point anywhere):
  *   - subvectors are int8 codes from [[Quantize.quantize]];
  *   - subspace assignment minimizes exact L2²: argmin ‖x−c‖² =
  *     argmax (2·x·c − ‖c‖²), compared as exact longs, ties to the lowest
  *     cell;
  *   - centroid update is ⌊Σx/n⌋ per dimension (empty cells carry);
  *   - ADC scores are exact-long sums of integer subspace dots.
  * Every intermediate is bit-identical under any partitioning and in the
  * DuckDB oracle replay of the unrolled iterations.
  *
  * Scale posture: training is one map-side assignment (codebooks
  * broadcast as literals) + ONE partial-agg'd (subspace, cell, dim)
  * shuffle per iteration — the driver materializes m·cells·subdim rows.
  * Encoding is a pure projection. ADC search broadcasts the query LUTs
  * (queries × m × cells longs) and runs one top-k window per query over
  * map-side scored codes — the corpus never shuffles its vectors, only
  * (query, neighbor, score) survivors.
  */
object Pq {

  /** Codebooks as [subspace][cell][subdim] integer arrays. */
  type Codebooks = Array[Array[Array[Int]]]

  private def subLen(dim: Int, m: Int): Int = {
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    dim / m
  }

  /** Exact-long L2 assignment score `2·dot(x,c) − ‖c‖²` for one subspace
    * slice (higher = closer); the n2c term is a driver-side constant.
    */
  private def l2Score(slice: Column, cv: Array[Int]): Column = {
    val n2c = cv.foldLeft(0L)((a, v) => a + v.toLong * v)
    lit(2L) * Quantize.intDot(slice, typedlit(cv.toSeq)) - lit(n2c)
  }

  private def bestCell(book: Array[Array[Int]], slice: Column): Column = {
    val scores = array(book.map(cv => l2Score(slice, cv)): _*)
    (array_position(scores, array_max(scores)) - 1).cast(IntegerType)
  }

  /** 1-based `slice` of the code array for subspace `s`. */
  private def subSlice(q: Column, s: Int, sub: Int): Column =
    slice(q, s * sub + 1, sub)

  /** Seed codebooks: the `cells` corpus rows with the smallest
    * (hash61(id), id) — the [[IvfInt.seededCodes]] rule — sliced per
    * subspace, so all subspaces seed from the SAME rows.
    */
  def seededCodebooks(
      quantized: DataFrame,
      idCol: String,
      m: Int,
      cells: Int): Codebooks = {
    val rows = IvfInt.seededCodes(quantized, idCol, cells)
    require(rows.nonEmpty, "empty corpus")
    val sub = subLen(rows.head.length, m)
    Array.tabulate(m)(s => rows.map(_.slice(s * sub, s * sub + sub)))
  }

  /** `iters` integer k-means rounds per subspace, all subspaces advanced
    * in the SAME pass: one assignment projection + one
    * (subspace, cell, dim) partial-agg shuffle per iteration.
    */
  def trainCodebooks(
      quantized: DataFrame,
      idCol: String,
      m: Int,
      cells: Int,
      iters: Int): Codebooks = {
    var books = seededCodebooks(quantized, idCol, m, cells)
    val sub = books(0)(0).length
    for (_ <- 0 until iters) {
      val bc = array(
        books.indices.map(s =>
          bestCell(books(s), subSlice(col("q"), s, sub))): _*)
      val sums = quantized
        .select(col("q"), bc.as("__bc"))
        .select(col("__bc"), posexplode(col("q")).as(Seq("__d", "__v")))
        .select(
          (col("__d") / sub).cast(IntegerType).as("__s"),
          element_at(col("__bc"), (col("__d") / sub).cast(IntegerType) + 1)
            .as("__cell"),
          (col("__d") % sub).cast(IntegerType).as("__ld"),
          col("__v"))
        .groupBy(col("__s"), col("__cell"), col("__ld"))
        .agg(
          sum(col("__v").cast(LongType)).as("__sum"),
          count(lit(1)).as("__n"))
        .collect()
      val next = books.map(_.map(_.clone())) // empty cells carry
      sums.foreach { r =>
        val (s, c, d) = (r.getInt(0), r.getInt(1), r.getInt(2))
        val (sm, n) = (r.getLong(3), r.getLong(4))
        next(s)(c)(d) = math.floor(sm.toDouble / n.toDouble).toInt
      }
      books = next
    }
    books
  }

  /** Trained codebooks as a gateable frame:
    * (subspace, cell, dim, value) — exact integers.
    */
  def trainedCodebooks(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      cells: Int,
      iters: Int): DataFrame = {
    val quant = Par.cached(
      Par.fan(IvfInt.quantizedWithNorm(corpus, idCol, vecCol)))
    val books = trainCodebooks(quant, idCol, m, cells, iters)
    val rows = for {
      (book, s) <- books.zipWithIndex
      (cv, c) <- book.zipWithIndex
      (v, d) <- cv.zipWithIndex
    } yield Row(s, c, d, v)
    corpus.sparkSession.createDataFrame(
      corpus.sparkSession.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(
        StructField("subspace", IntegerType, nullable = false),
        StructField("cell", IntegerType, nullable = false),
        StructField("dim", IntegerType, nullable = false),
        StructField("value", IntegerType, nullable = false))))
  }

  /** PQ codes for a quantized frame under `books`: (`idCol`, codes:
    * array<int> of length m) — a pure projection.
    */
  def encode(
      quantized: DataFrame,
      idCol: String,
      books: Codebooks): DataFrame = {
    val sub = books(0)(0).length
    quantized.select(
      col(idCol),
      array(
        books.indices.map(s =>
          bestCell(books(s), subSlice(col("q"), s, sub))): _*).as("codes"))
  }

  /** ADC top-k: rank corpus codes per query by the exact-long ADC inner
    * product `Σ_s dot(q_s, book[s][code_s])`. Output:
    * (query_id, neighbor_id, rank, adc). Queries broadcast with their
    * LUTs; ties break on the neighbor id.
    */
  def adcTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int,
      m: Int = 4,
      cells: Int = 16,
      iters: Int = 2): DataFrame = {
    val quant = Par.cached(
      Par.fan(IvfInt.quantizedWithNorm(corpus, corpusId, corpusVec)))
    val books = trainCodebooks(quant, corpusId, m, cells, iters)
    val sub = books(0)(0).length

    val coded = encode(quant, corpusId, books)
      .withColumnRenamed(corpusId, "neighbor_id")

    // per-query LUT: lut[s][c] = dot(q_slice_s, book[s][c]) as exact longs
    val lut = array(books.indices.map { s =>
      array(books(s).map(cv =>
        Quantize.intDot(subSlice(col("q"), s, sub), typedlit(cv.toSeq))): _*)
    }: _*)
    val q = IvfInt
      .quantizedWithNorm(queries, queryId, queryVec)
      .select(col(queryId).as("query_id"), lut.as("__lut"))

    val scored = coded
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn(
        "adc",
        aggregate(
          zip_with(
            col("codes"),
            col("__lut"),
            (code, row) => element_at(row, code + 1)),
          lit(0L),
          (acc, x) => acc + x))
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("adc"))
  }
}
