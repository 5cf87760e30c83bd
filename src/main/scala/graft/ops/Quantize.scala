package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Int8 scalar quantization for embedding columns — the "shrink the vector
  * store 4×" step in front of large-scale similarity search.
  *
  * At 100 TB an `Array[Float]` embedding column is often the single largest
  * column in the corpus; per-vector symmetric int8 quantization cuts its
  * storage, shuffle and scan volume 4× while keeping cosine ranking nearly
  * intact (max|x|/127 resolution per vector). Everything here is map-side
  * codegen — quantization adds ZERO shuffles to whatever search plan
  * consumes the codes — and all arithmetic is exact-integer or
  * deterministic IEEE double, so results are reproducible run-to-run and
  * engine-to-engine (the DuckDB oracle replays them bit-for-bit).
  *
  * Quantization contract (pinned by spec + driver gate):
  *   - scale  = max|x| / 127, or 1.0 for the all-zero vector
  *   - code_i = floor(x_i / scale + 0.5)  — round-half-UP in both engines
  *     (`round()` would diverge: Spark HALF_UP vs DuckDB half-away-from-zero
  *     disagree on negative halves), always in [-127, 127] by construction
  *   - cosine over codes needs NO scales: they cancel in
  *     dot/(|a|·|b|) — so ranking never touches a float from the original
  *     vector, only exact integer dots (≤ 127²·dim ≪ 2⁶³).
  *
  * Spark-first: quantized vectors are ordinary `array<int>` columns —
  * write them to parquet, shuffle them, or feed them to [[Similarity]]'s
  * IVF/LSH machinery; no custom storage format, no driver state.
  */
object Quantize {

  /** Per-vector symmetric scale: `max|x| / 127` (1.0 for the zero vector,
    * so codes are well-defined everywhere).
    */
  def int8Scale(vec: Column): Column = {
    val maxAbs = array_max(transform(vec, x => abs(x.cast(DoubleType))))
    when(maxAbs === lit(0.0d), lit(1.0d)).otherwise(maxAbs / lit(127.0d))
  }

  /** Integer codes for `vec` under `scale`: `floor(x/scale + 0.5)`,
    * round-half-up — portable, unlike `round` (see object scaladoc).
    */
  def int8Codes(vec: Column, scale: Column): Column =
    transform(
      vec,
      x => floor(x.cast(DoubleType) / scale + lit(0.5d)).cast(IntegerType))

  /** Exact integer dot product of two code arrays (ordered fold, long —
    * 127²·dim per term keeps any realistic dim far from overflow). Backed
    * by the codegen'd [[org.apache.spark.sql.graft.IntDotF]] expression:
    * HOF folds are interpreted (CodegenFallback) and dominated the
    * quantized brute-force scan — the 100× smoke's 20M pair dots spent
    * ~150 s in lambda frames; the tight generated loop matches the float
    * path. Results are identical exact integers either way (same fold
    * order; [[intDotHof]] kept as the portable reference, spec'd equal).
    */
  def intDot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.IntDotF(
        org.apache.spark.sql.graft.ColumnShim.expression(a),
        org.apache.spark.sql.graft.ColumnShim.expression(b)))

  /** The interpreted HOF formulation of [[intDot]] (portable reference). */
  def intDotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(LongType) * y.cast(LongType)),
      lit(0L),
      (acc, x) => acc + x)

  /** Cosine over int8 codes: `dot/(√(a·a)·√(b·b))` — the per-vector scales
    * cancel, so the score is a deterministic double computed from exact
    * integers (0.0 when either side is the zero vector).
    */
  def intCosine(a: Column, b: Column, na: Column, nb: Column): Column =
    when(na === 0L || nb === 0L, lit(0.0d)).otherwise(
      intDot(a, b).cast(DoubleType) /
        (sqrt(na.cast(DoubleType)) * sqrt(nb.cast(DoubleType))))

  /** Reconstruct approximate float vectors from codes: `q_i · scale`.
    * Map-side; reconstruction error is bounded by `scale/2` per dimension
    * (spec'd). Feed the result to any float-vector consumer
    * ([[Similarity.ivfTopK]], [[Pca.project]]) when exact inputs are gone.
    */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, q => (q.cast(DoubleType) * scale).cast(FloatType))

  /** Quantize an embedding table: `(id, scale, q)` with `q: array<int>`.
    * Pure map-side projection — partitioning of `df` is preserved.
    */
  def quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    // max|x| and scale staged through their own projections, each
    // referenced twice downstream so CollapseProject cannot re-inline them
    // (the Chunking staging pattern): ONE array_max fold and one scale per
    // row, with the codes lambda reading the scale attribute
    df.select(
        col(idCol),
        col(vecCol),
        array_max(transform(col(vecCol), x => abs(x.cast(DoubleType))))
          .as("__maxabs"))
      .select(
        col(idCol),
        col(vecCol),
        when(col("__maxabs") === lit(0.0d), lit(1.0d))
          .otherwise(col("__maxabs") / lit(127.0d))
          .as("scale"))
      .select(
        col(idCol),
        col("scale"),
        int8Codes(col(vecCol), col("scale")).as("q"))

  /** Exact top-k neighbors per query by QUANTIZED cosine — the
    * [[Similarity.bruteForceTopK]] plan shape (broadcast query set, one
    * top-k shuffle) over int8 codes instead of floats: the corpus-side scan
    * reads 4× fewer vector bytes and every dot is exact integer math.
    *
    * Output: (query_id, neighbor_id, rank, qdot, qcos).
    */
  def quantizedTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    // quantize + self-norm once per side BEFORE the join — inside the join
    // output they would be recomputed once per pair
    def side(df: DataFrame, id: String, vec: String, prefix: String) =
      // scale and codes staged through their own projections, each
      // referenced twice downstream so CollapseProject cannot re-inline
      // max|x| into the per-element codes lambda (the [[quantize]] /
      // Chunking staging pattern): one scale eval per row, one
      // quantization per vector, the norm fold reads the attribute
      quantize(df.select(col(id).as(s"${prefix}_id"), col(vec)),
          s"${prefix}_id", vec)
        .select(
          col(s"${prefix}_id"),
          col("q").as(s"__${prefix}q"),
          intDot(col("q"), col("q")).as(s"__${prefix}n"))
    val q = side(queries, queryId, queryVec, "query")
    val c = side(Par.fan(corpus), corpusId, corpusVec, "neighbor")
    val scored = c
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("qdot", intDot(col("__queryq"), col("__neighborq")))
      .withColumn(
        "qcos",
        when(col("__queryn") === 0L || col("__neighborn") === 0L, lit(0.0d))
          .otherwise(col("qdot").cast(DoubleType) /
            (sqrt(col("__queryn").cast(DoubleType)) *
              sqrt(col("__neighborn").cast(DoubleType)))))
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("qcos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(
        col("query_id"),
        col("neighbor_id"),
        col("rank"),
        col("qdot"),
        col("qcos"))
  }

  /** Maximum-inner-product search (MIPS) over int8 codes — the
    * recommender/retrieval ranking where MAGNITUDE matters (user·item
    * scores, unnormalized relevance): cosine's length normalization is
    * exactly what MIPS must NOT do, so this is a distinct semantics, not
    * a flag on [[quantizedTopK]].
    *
    * The quantized inner product de-quantizes as `qdot · s_q · s_c` (the
    * per-vector max-abs/127 scales) — exact integer dot times two
    * correctly-rounded doubles in a FIXED association order
    * `(qdot·s_q)·s_c`, so scores are bit-reproducible cross-engine.
    * Same plan shape as [[quantizedTopK]]: broadcast queries, map-side
    * scoring, one per-query top-k exchange.
    *
    * Output: (query_id, neighbor_id, rank, qdot, mips_score).
    */
  def mipsTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    def side(df: DataFrame, id: String, vec: String, prefix: String) =
      quantize(df.select(col(id).as(s"${prefix}_id"), col(vec)),
          s"${prefix}_id", vec)
        .select(
          col(s"${prefix}_id"),
          col("q").as(s"__${prefix}q"),
          col("scale").as(s"__${prefix}s"))
    val q = side(queries, queryId, queryVec, "query")
    val c = side(Par.fan(corpus), corpusId, corpusVec, "neighbor")
    val scored = c
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("qdot", intDot(col("__queryq"), col("__neighborq")))
      .withColumn(
        "mips_score",
        col("qdot").cast(DoubleType) * col("__querys") * col("__neighbors"))
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("mips_score").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(
        col("query_id"),
        col("neighbor_id"),
        col("rank"),
        col("qdot"),
        col("mips_score"))
  }

  /** Mutual nearest-neighbor pair mining across TWO corpora — the
    * parallel-corpus alignment primitive (LASER / CCMatrix-style bitext
    * mining, cross-lingual sentence pairing, caption-to-image matching):
    * emit (a, b) exactly when b is a's best match in B AND a is b's best
    * match in A. Mutuality is the classic precision filter — a hub
    * sentence that is "everyone's nearest neighbor" on one side survives
    * only for the single partner that reciprocates.
    *
    * Scores are quantized cosine (`quantize` int8 codes + exact integer
    * dots; the s_quant_topk determinism trade), argmax tie-broken by
    * neighbor id — a total order, so two engines cannot disagree.
    *
    * Scale posture: the smaller corpus `a` BROADCASTS into a map-side
    * scan of `b` (the audited bounded-query-broadcast shape of
    * [[quantizedTopK]]/[[mipsTopK]]); each direction's top-1 is a
    * map-side WindowGroupLimit before one per-key exchange, and the
    * mutual join is over |A|+|B| winner rows. For two LARGE corpora,
    * block both sides by IVF cell first (P6b/P73) and run per-cell —
    * mutual-of-blocked equals blocked-of-mutual whenever true partners
    * share a cell, the standard mining recall trade.
    *
    * Output: (`id_a`, `id_b`, `qdot`, `qcos`), one row per mutual pair.
    */
  def mutualTopPairs(
      a: DataFrame,
      aId: String,
      aVec: String,
      b: DataFrame,
      bId: String,
      bVec: String): DataFrame = {
    def side(df: DataFrame, id: String, vec: String, prefix: String) =
      quantize(df.select(col(id).as(s"${prefix}_id"), col(vec)),
          s"${prefix}_id", vec)
        .select(
          col(s"${prefix}_id"),
          col("q").as(s"__${prefix}q"),
          intDot(col("q"), col("q")).as(s"__${prefix}n"))
    val qa = side(a, aId, aVec, "a")
    val qb = side(Par.fan(b), bId, bVec, "b")
    val scored = qb
      .crossJoin(broadcast(qa))
      .withColumn("qdot", intDot(col("__aq"), col("__bq")))
      .withColumn(
        "qcos",
        when(col("__an") === 0L || col("__bn") === 0L, lit(0.0d))
          .otherwise(col("qdot").cast(DoubleType) /
            (sqrt(col("__an").cast(DoubleType)) *
              sqrt(col("__bn").cast(DoubleType)))))
      .select(col("a_id"), col("b_id"), col("qdot"), col("qcos"))
    val wa = Window
      .partitionBy(col("a_id"))
      .orderBy(col("qcos").desc, col("b_id").asc)
    val wb = Window
      .partitionBy(col("b_id"))
      .orderBy(col("qcos").desc, col("a_id").asc)
    val topA = scored
      .withColumn("__rn", row_number().over(wa))
      .filter(col("__rn") === 1)
      .select(
        col("a_id").as("id_a"), col("b_id").as("id_b"),
        col("qdot"), col("qcos"))
    val topB = scored
      .withColumn("__rn", row_number().over(wb))
      .filter(col("__rn") === 1)
      .select(col("a_id").as("id_a"), col("b_id").as("id_b"))
    topA.join(topB, Seq("id_a", "id_b"))
  }
  /** Sign (1-bit) quantization: dim sign bits packed 32 per 64-bit word —
    * a 32× compression of the vector column, the memory-scale extreme of
    * the quantization ladder (float → int8 → sign). Bit j of word w is
    * `vec[w·32+j] >= 0`; packing multiplies-and-adds from the high bit
    * down, so no shift ever reaches 32 and both engines' signed-64
    * arithmetic is exact (the DuckDB oracle replays with `1::BIGINT << j`,
    * j ≤ 31). Sign bits are exact properties of the floats — no rounding
    * mode can diverge — so sign-quantized search hash-gates where
    * float-trained structures cannot.
    */
  def signPack(vec: Column, dim: Int): Column = {
    require(dim > 0 && dim % 32 == 0, "dim must be a positive multiple of 32")
    array((0 until dim / 32).map { w =>
      aggregate(
        sequence(lit(31), lit(0), lit(-1)),
        lit(0L),
        (acc, j) =>
          acc * 2 + when(
            element_at(vec, (j + lit(w * 32 + 1)).cast(IntegerType)) >=
              lit(0.0f),
            1L).otherwise(0L))
    }: _*)
  }

  /** Hamming distance between two [[signPack]]ed signatures (exact integer;
    * popcount of the per-word XORs). Map-side codegen — the standard
    * distance for sign-quantized ANN (≈ angular distance up to the
    * arccos(1 - 2h/d) monotone map).
    */
  def hamming(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0L),
      (acc, v) => acc + v.cast(LongType))
}
