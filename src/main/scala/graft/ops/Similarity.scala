package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Brute-force cosine top-k is the exact baseline: broadcast the (small)
  * query set against the (huge) corpus — a map-side nested loop with one
  * final top-k shuffle per query, which is the right plan at 100 TB when
  * |queries| ≪ |corpus|. The LSH variant prunes candidates with seeded
  * random-hyperplane sign buckets so the per-query work drops from O(N) to
  * O(bucket).
  *
  * FP determinism: dot products fold left-to-right in index order over
  * doubles (`aggregate` over `zip_with`), matching DuckDB's `list_reduce`
  * bit-for-bit; cosine is computed as `dot / (sqrt(na) * sqrt(nb))` in both
  * engines.
  */
object Similarity {

  /** Ordered-fold dot product of two float-array columns, in double —
    * backed by the codegen'd [[org.apache.spark.sql.graft.DotProductF]] expression
    * (identical accumulation order to the HOF formulation and to DuckDB's
    * `list_reduce`, so oracle results are bit-equal; ~10x faster than the
    * interpreted higher-order-function path on brute-force scans).
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.DotProductF(
        org.apache.spark.sql.graft.ColumnShim.expression(a),
        org.apache.spark.sql.graft.ColumnShim.expression(b)))

  /** The HOF formulation (kept as the portable reference implementation and
    * for non-float arrays).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0d),
      (acc, x) => acc + x)

  /** Squared L2 norm (ordered fold, double). */
  def norm2(a: Column): Column = dot(a, a)

  /** Cosine similarity, `dot / (sqrt(na) * sqrt(nb))`. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Exact top-k nearest neighbors by cosine for each query vector.
    *
    * @param corpus  (id, vec) rows — the big side
    * @param queries (id, vec) rows — must be broadcast-small
    */
  def bruteForceTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int): DataFrame = {
    // norms are per-vector, so compute them once per side BEFORE the join —
    // inside the join output they would be re-evaluated once per pair
    val q = queries.select(
      col(queryId).as("query_id"),
      col(queryVec).as("__qv"),
      sqrt(norm2(col(queryVec))).as("__qn"))
    val c = Par.fan(corpus).select(
      col(corpusId).as("neighbor_id"),
      col(corpusVec).as("__cv"),
      sqrt(norm2(col(corpusVec))).as("__cn"))
    val scored = c
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn(
        "cos",
        dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(
        col("query_id"),
        col("neighbor_id"),
        col("rank"),
        col("cos").as("cos_sim"))
  }

  /** Hard-negative mining for embedding-model training (the contrastive
    * counterpart of [[bruteForceTopK]]): for each query, the `k` corpus
    * vectors MOST similar by cosine whose label differs from the query's —
    * the near-miss negatives that make contrastive losses informative
    * (random negatives are trivially separable).
    *
    * Same scale contract and plan shape as [[bruteForceTopK]]: queries
    * broadcast (|Q| ≪ corpus), norms precomputed per side before the join,
    * label mismatch filters INSIDE the broadcast join (map-side — excluded
    * rows never reach the window), per-query top-k via a WindowGroupLimit-
    * prunable rank window (one exchange carrying ≤ |Q|·k·partitions rows).
    */
  def hardNegatives(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      corpusLabel: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      queryLabel: String,
      k: Int): DataFrame = {
    val q = queries.select(
      col(queryId).as("query_id"),
      col(queryLabel).as("__ql"),
      col(queryVec).as("__qv"),
      sqrt(norm2(col(queryVec))).as("__qn"))
    val c = Par.fan(corpus).select(
      col(corpusId).as("neighbor_id"),
      col(corpusLabel).as("__cl"),
      col(corpusVec).as("__cv"),
      sqrt(norm2(col(corpusVec))).as("__cn"))
    val scored = c
      .join(
        broadcast(q),
        col("query_id") =!= col("neighbor_id") &&
          col("__ql") =!= col("__cl"))
      .withColumn(
        "cos",
        dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(
        col("query_id"),
        col("neighbor_id"),
        col("rank"),
        col("cos").as("cos_sim"))
  }

  /** Deterministic per-group mean pooling of embeddings — chunk embeddings
    * → document embedding, member embeddings → class centroid: the standard
    * "pool then index" step between chunk-level encoders and doc-level
    * retrieval.
    *
    * Why not `avg()` per dimension: float addition is not associative, and
    * a shuffle-order `sum()` over group members produces run-dependent
    * low-bit results (the same reassociation that keeps k-means/PCA gates
    * rows-only). Here each group's members are FOLDED IN `orderCol` ORDER
    * inside one collected, sorted list — bit-reproducible across runs,
    * partitionings, AND engines, which is what lets the gate hash raw
    * doubles.
    *
    * Scale posture: ONE shuffle (partial-agg collect_list on the group
    * key); per-group state is bounded by group size × dim (chunks per doc:
    * tens — this is a per-DOC pool, not a corpus-wide agg). The fold reads
    * each element once (n·dim work per group); dims are read from the
    * first member at runtime, so no static dimension config.
    *
    * Output: (group, n_members, pooled: array<double>).
    */
  def meanPool(
      df: DataFrame,
      groupCol: String,
      orderCol: String,
      vecCol: String): DataFrame = {
    val vs = array_sort(col("__vs")) // struct sort = (ord asc, vec)
    val n = size(col("__vs"))
    val dim = size(col("__vs")(0).getField("vec"))
    val pooled = transform(
      sequence(lit(1), dim),
      d =>
        aggregate(
          vs,
          lit(0.0d),
          (acc, s) => acc + element_at(s.getField("vec"), d).cast(DoubleType))
          / n.cast(DoubleType))
    Par.fan(df)
      .groupBy(col(groupCol))
      .agg(collect_list(
        struct(col(orderCol).as("ord"), col(vecCol).as("vec"))).as("__vs"))
      .select(
        col(groupCol),
        n.as("n_members"),
        pooled.as("pooled"))
  }

  /** Seeded deterministic pseudo-random hyperplane component for plane `p`,
    * dimension `i`: ±1 from a portable md5-derived hash of "p:i".
    */
  private def planeSign(p: Int, i: Column): Column =
    when(
      TextFunctions
        .hash61(concat(lit(s"plane$p:"), i.cast(StringType)))
        .bitwiseAND(1L) === 1L,
      lit(1.0d)).otherwise(lit(-1.0d))

  /** Random-hyperplane LSH bucket code (`planes` sign bits) for a vector
    * column — sign of Σ_i s(p,i)·v_i per plane. Runtime-dimension variant:
    * works on ragged arrays but re-derives every ±1 sign with an md5
    * digest PER ELEMENT PER ROW inside an interpreted HOF fold — prefer
    * [[lshBucketFixedDim]] on fixed-dimension corpora (every real
    * embedding table), which hoists the signs out of the scan entirely.
    */
  def lshBucket(vec: Column, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(
          vec,
          sequence(lit(1), size(vec)),
          (x, i) => x.cast(DoubleType) * planeSign(p, i)),
        lit(0.0d),
        (acc, x) => acc + x)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** [[lshBucket]] for FIXED-dimension vectors: the ±1 signs depend only
    * on (plane, position), so they are computed ONCE here — the same
    * [[org.apache.spark.sql.graft.Hash61Util]] bit the column expression
    * uses — instead of `planes × dim` md5 digests per row, and each
    * projection becomes a codegen [[dot]] against a literal sign vector.
    * Same left-to-right double accumulation and `±1.0` factors ⇒ buckets
    * are BIT-IDENTICAL to the runtime variant (spec'd; the `s_lsh_bucket`
    * oracle replays unchanged). Null elements: the codegen dot skips them
    * (contributes 0) where the HOF fold poisons the row to bucket 0 —
    * embeddings have no null elements. Rows longer than `dim` ignore the
    * tail; measure `dim` from the data ([[vecDim]]).
    */
  def lshBucketFixedDim(vec: Column, planes: Int, dim: Int): Column = {
    require(dim > 0, s"dim must be positive (got $dim)")
    val bits = (0 until planes).map { p =>
      val signs = Array.tabulate(dim) { j =>
        val h = org.apache.spark.sql.graft.Hash61Util.hash(
          s"plane$p:${j + 1}"
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        if ((h & 1L) == 1L) 1.0f else -1.0f
      }
      val proj = dot(vec, typedlit(signs.toSeq))
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Element count of the first row's vector (one tiny job) — the `dim`
    * for [[lshBucketFixedDim]] on fixed-dimension corpora.
    */
  def vecDim(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).first().getInt(0)

  /** Johnson-Lindenstrauss random-sign projection components: the `k`
    * dot products of `vec` against deterministic ±1 sign vectors (signs
    * from the portable hash — the [[lshBucketFixedDim]] plane machinery,
    * emitting the projection VALUES instead of the sign bits). JL says
    * pairwise distances survive within (1±ε) at k = O(log n / ε²); unlike
    * [[Pca]] (whose eigenvectors compose float sums that cannot
    * hash-match cross-engine), the sign projection is a fixed per-row
    * fold — deterministic, engine-portable, hash-gateable. The 1/√k
    * normalization is omitted: cosine and relative distances are
    * scale-invariant (document if absolute distances matter).
    *
    * Scale posture: pure map-side codegen (`DotProductF` per component
    * against literal sign vectors) — zero shuffles at any corpus size;
    * the sign matrix is compiled into the plan, never stored or joined.
    */
  def jlComponents(vec: Column, k: Int, dim: Int): Seq[Column] = {
    require(k > 0, s"k must be positive (got $k)")
    require(dim > 0, s"dim must be positive (got $dim)")
    (0 until k).map { p =>
      val signs = Array.tabulate(dim) { j =>
        val h = org.apache.spark.sql.graft.Hash61Util.hash(
          s"jl$p:${j + 1}"
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        if ((h & 1L) == 1L) 1.0f else -1.0f
      }
      dot(vec, typedlit(signs.toSeq))
    }
  }

  /** [[jlComponents]] as one `array<double>` column. */
  def jlProject(vec: Column, k: Int, dim: Int): Column =
    array(jlComponents(vec, k, dim): _*)

  /** Exact embedding-cosine near-duplicate pairs (no blocking): all
    * (id_a < id_b) pairs with cosine ≥ `threshold`. O(N²/2) dot products —
    * the exact baseline; use [[cosineNearDupPairs]] for the LSH-blocked
    * scale path.
    */
  def cosinePairsExact(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val side = Par.fan(corpus).select(
      col(idCol).as("id"),
      col(vecCol).as("__v"),
      sqrt(norm2(col(vecCol))).as("__n"))
    val a = side.select(col("id").as("id_a"), col("__v").as("__va"), col("__n").as("__na"))
    val b = side.select(col("id").as("id_b"), col("__v").as("__vb"), col("__n").as("__nb"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn(
        "cos",
        dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos").as("cos_sim"))
  }

  /** Target expected bucket size for [[planesFor]]: pair work per bucket is
    * O(target²/2), small enough to stay comfortably inside one task.
    */
  val TargetBucketSize = 1024L

  /** Plane count that bounds the EXPECTED bucket size by
    * [[TargetBucketSize]]: the smallest `p` with `n / 2^p ≤ target`. This is
    * what keeps the blocked pair space O(n · target) instead of O(n²) as the
    * corpus grows — a constant plane count quietly reverts to quadratic at
    * 100 TB.
    */
  def planesFor(n: Long, target: Long = TargetBucketSize): Int = {
    var p = 0
    var buckets = 1L
    while (buckets * target < n && p < 62) { p += 1; buckets <<= 1 }
    math.max(p, 1)
  }

  /** Embedding-cosine near-duplicate pairs: all (id_a < id_b) pairs with
    * cosine ≥ `threshold`, blocked by LSH bucket so the pair space is
    * per-bucket, not corpus², with exact cosine verification inside each
    * bucket. Identical vectors always share a bucket, so exact duplicates
    * are never missed; near-duplicate recall follows the usual
    * random-hyperplane bound (raise `planes` for precision, lower for
    * recall).
    *
    * `planes ≤ 0` (the default) derives the plane count from the corpus
    * size via [[planesFor]] (one count job), keeping expected bucket sizes
    * bounded at any corpus scale; pass an explicit positive `planes` for
    * oracle-reproducible runs. Each vector lands in exactly ONE bucket, so
    * a pair can never be emitted twice — no dedup pass is needed.
    */
  def cosineNearDupPairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      planes: Int = 0): DataFrame = {
    val p = if (planes > 0) planes else planesFor(corpus.count())
    val side = Par.cached(Par.fan(corpus).select(
      col(idCol).as("id"),
      col(vecCol).as("__v"),
      sqrt(norm2(col(vecCol))).as("__n"),
      lshBucketFixedDim(col(vecCol), p, vecDim(corpus, vecCol))
        .as("__bucket")))
    val a = side.select(
      col("__bucket"),
      col("id").as("id_a"),
      col("__v").as("__va"),
      col("__n").as("__na"))
    val b = side.select(
      col("__bucket"),
      col("id").as("id_b"),
      col("__v").as("__vb"),
      col("__n").as("__nb"))
    a.join(b, Seq("__bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn(
        "cos",
        dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos").as("cos_sim"))
  }

  /** SemDeDup-style semantic dedup: drop all but one member of each
    * embedding-cosine near-duplicate cluster. Pairs come from the
    * LSH-blocked [[cosineNearDupPairs]] (pair space bounded per bucket, not
    * corpus²), clusters from connected components over the pair graph
    * ([[graft.ops.Dedup.nearDupClusters]] — min-label propagation on the
    * edge list only), and each cluster keeps its minimum id.
    *
    * Returns the surviving rows of `corpus`, schema unchanged. Scale
    * posture inherits from the parts: one bucket join over LSH blocks, a
    * bounded-iteration edge-list propagation, and an anti-join whose build
    * side is only the duplicates.
    */
  def semanticDedup(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      planes: Int = 0,
      maxIters: Int = 20): DataFrame =
    graft.ops.Dedup.keepOnePerCluster(
      corpus,
      idCol,
      cosineNearDupPairs(corpus, idCol, vecCol, threshold, planes),
      maxIters = maxIters)

  /** IVF (inverted-file) approximate top-k — the coarse-quantizer scale
    * path: corpus vectors are assigned to the nearest of `cells` centroids;
    * each query probes its `nprobe` nearest cells and ranks exact cosine
    * within them.
    *
    * Centroids: seeded deterministic sample by default (`trainIters = 0`),
    * or spherical k-means via [[trainSphericalKMeans]] when `trainIters > 0`.
    * Centroids broadcast; assignment is map-side; the only shuffle keys on
    * the cell id. Expected candidate set is |corpus| * nprobe / cells.
    */
  /** Deterministic centroid seed: the `cells` corpus vectors with the
    * smallest portable hash of their id (a seeded sample; the collect is
    * `cells` rows).
    */
  def seededCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      cells: Int): Array[Array[Float]] =
    corpus
      .select(
        col(idCol).cast(StringType).as("__id"),
        col(vecCol).as("__v"))
      .withColumn("__h", TextFunctions.hash61(col("__id")))
      .orderBy(col("__h").asc, col("__id").asc)
      .limit(cells)
      .collect()
      .map(r => r.getSeq[Float](1).toArray)

  private def scoresFor(
      centroids: Array[Array[Float]],
      vec: Column): Column =
    array(centroids.map(cv => dot(vec, typedLit(cv))): _*)

  private def bestCellFor(
      centroids: Array[Array[Float]],
      vec: Column): Column = {
    val scores = scoresFor(centroids, vec)
    (array_position(scores, array_max(scores)) - 1).cast(IntegerType)
  }

  /** The IVF map-side assignment step on its own: each corpus vector's best
    * (max dot score) centroid cell, 0-based in centroid order, ties to the
    * first (lowest) index. Centroids broadcast as literals; assignment is a
    * narrow codegen'd pass — the exact shape `ivfTopK` plans, exposed so
    * the cell math is driver-gateable against a relational oracle.
    */
  def ivfAssign(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Float]]): DataFrame = {
    require(centroids.nonEmpty, "centroids must be non-empty")
    Par.fan(corpus).select(
      col(idCol),
      bestCellFor(centroids, col(vecCol)).as("cell"))
  }

  /** Deterministic one-scan centroid init (the k-means|| shape: oversample
    * distributed, recluster locally): ONE top-k job pulls the
    * `cells * oversample` corpus vectors with the smallest portable id hash
    * (a seeded sample, hash61-ordered for determinism), then farthest-point
    * selection runs LOCALLY on that sample — start from the hash-minimal
    * vector, repeatedly add the sample vector whose maximum cosine to any
    * chosen centroid is smallest (ties by id).
    *
    * Replaces a per-centroid corpus-scan loop: O(1) Spark jobs regardless
    * of `cells` (the old shape was O(cells) full-corpus broadcast scans,
    * each ending in a driver collect — a thousand jobs at cells=1024).
    * Local work is O(cells · cells · oversample · dim), trivial for coarse
    * quantizers. Still avoids the duplicate-cluster traps plain sampling
    * falls into, because selection is farthest-point within the sample.
    */
  def oversampledCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      cells: Int,
      oversample: Int = 8): Array[Array[Float]] = {
    val sample = corpus
      .select(
        col(idCol).cast(StringType).as("__id"),
        col(vecCol).as("__v"))
      .withColumn("__h", TextFunctions.hash61(col("__id")))
      .orderBy(col("__h").asc, col("__id").asc)
      .limit(math.max(cells * oversample, cells))
      .collect()
      .map(r => (r.getString(0), r.getSeq[Float](1).toArray))
    if (sample.isEmpty) return Array.empty
    def cosLocal(a: Array[Float], b: Array[Float], na: Double, nb: Double): Double = {
      var acc = 0.0d
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      if (na == 0 || nb == 0) 0.0 else acc / (na * nb)
    }
    val norms = sample.map(s => math.sqrt(s._2.map(x => x.toDouble * x).sum))
    val k = math.min(cells, sample.length)
    val chosenIdx = scala.collection.mutable.ArrayBuffer(0) // hash-minimal seed
    // bestSim(i) = max cosine of sample i to any chosen centroid so far;
    // each round adds one centroid and relaxes the array — O(k·|sample|·dim)
    val bestSim = Array.tabulate(sample.length)(i =>
      cosLocal(sample(i)._2, sample(0)._2, norms(i), norms(0)))
    while (chosenIdx.length < k) {
      var best = -1
      for (i <- sample.indices if !chosenIdx.contains(i)) {
        if (best < 0 || bestSim(i) < bestSim(best) ||
          (bestSim(i) == bestSim(best) && sample(i)._1 < sample(best)._1))
          best = i
      }
      chosenIdx += best
      for (i <- sample.indices) {
        val s = cosLocal(sample(i)._2, sample(best)._2, norms(i), norms(best))
        if (s > bestSim(i)) bestSim(i) = s
      }
    }
    chosenIdx.map(sample(_)._2).toArray
  }

  /** Spherical k-means (Lloyd's) for IVF coarse quantizers: assignment by
    * max dot against L2-normalized centroids, update = element-wise mean,
    * re-normalized. Scale shape per iteration: centroids broadcast in the
    * assignment expressions (map-side), then ONE shuffle of
    * (cell, dim, value) with map-side partial aggregation — no iteration
    * ever moves the corpus. Empty cells keep their previous centroid.
    *
    * Seeded-deterministic up to float addition order inside `avg` (the
    * standard caveat for distributed means); use the un-trained seeded
    * sample where bit-reproducibility is required.
    */
  def trainSphericalKMeans(
      corpus: DataFrame,
      vecCol: String,
      init: Array[Array[Float]],
      iters: Int): Array[Array[Float]] = {
    def normalized(v: Array[Double]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v.map(_.toFloat) else v.map(x => (x / n).toFloat)
    }
    var centroids = init.map(c => normalized(c.map(_.toDouble)))
    for (_ <- 1 to iters) {
      val means = corpus
        .select(
          bestCellFor(centroids, col(vecCol)).as("__cell"),
          posexplode(col(vecCol)).as(Seq("__pos", "__val")))
        .groupBy(col("__cell"), col("__pos"))
        .agg(avg(col("__val")).as("__mean"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2))
        }
      centroids = centroids.zipWithIndex.map { case (old, i) =>
        means.get(i).map(normalized).getOrElse(old)
      }
    }
    centroids
  }

  def ivfTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int,
      cells: Int = 16,
      nprobe: Int = 4,
      trainIters: Int = 0): DataFrame = {
    val centroids =
      if (trainIters > 0)
        trainSphericalKMeans(
          corpus,
          corpusVec,
          oversampledCentroids(corpus, corpusId, corpusVec, cells),
          trainIters)
      else seededCentroids(corpus, corpusId, corpusVec, cells)

    def cellScores(vec: Column): Column = scoresFor(centroids, vec)

    // argmax cell per corpus vector (scores array evaluated once per ref)
    def bestCell(vec: Column): Column = {
      val scores = cellScores(vec)
      (array_position(scores, array_max(scores)) - 1).cast(IntegerType)
    }

    val c = Par.fan(corpus).select(
      col(corpusId).as("neighbor_id"),
      col(corpusVec).as("__cv"),
      sqrt(norm2(col(corpusVec))).as("__cn"),
      bestCell(col(corpusVec)).as("__cell"))

    // per query: top-nprobe cells by score
    val qScored = queries.select(
      col(queryId).as("query_id"),
      col(queryVec).as("__qv"),
      sqrt(norm2(col(queryVec))).as("__qn"),
      posexplode(cellScores(col(queryVec))).as(Seq("__cell", "__cscore")))
    val pw = Window
      .partitionBy(col("query_id"))
      .orderBy(col("__cscore").desc, col("__cell").asc)
    val qCells = qScored
      .withColumn("__crank", row_number().over(pw))
      .filter(col("__crank") <= nprobe)
      .select(col("query_id"), col("__qv"), col("__qn"), col("__cell"))

    val scored = c
      .join(broadcast(qCells), Seq("__cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn(
        "cos",
        dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(
        col("query_id"),
        col("neighbor_id"),
        col("rank"),
        col("cos").as("cos_sim"))
  }

  /** Approximate top-k: candidates restricted to the query's LSH bucket,
    * then exact cosine rank within the bucket. Recall < 1 by construction;
    * the scale win is that the per-query candidate set is |corpus| / 2^planes
    * in expectation, and the join shuffles on the bucket code.
    */
  def lshTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int,
      planes: Int = 8): DataFrame = {
    // one dim for both sides (cosine requires it anyway); signs hoisted
    val dim = vecDim(corpus, corpusVec)
    val q = queries.select(
      col(queryId).as("query_id"),
      col(queryVec).as("__qv"),
      sqrt(norm2(col(queryVec))).as("__qn"),
      lshBucketFixedDim(col(queryVec), planes, dim).as("__bucket"))
    val c = Par.fan(corpus).select(
      col(corpusId).as("neighbor_id"),
      col(corpusVec).as("__cv"),
      sqrt(norm2(col(corpusVec))).as("__cn"),
      lshBucketFixedDim(col(corpusVec), planes, dim).as("__bucket"))
    val scored = c
      .join(broadcast(q), Seq("__bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn(
        "cos",
        dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(
        col("query_id"),
        col("neighbor_id"),
        col("rank"),
        col("cos").as("cos_sim"))
  }
}
