package graft.ops

import breeze.linalg.{eigSym, DenseMatrix, DenseVector}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA dimensionality reduction for embedding columns — the standard
  * "project 4096-dim embeddings to 64 before ANN" step that makes
  * billion-vector similarity search tractable.
  *
  * Spark-first shape:
  *   - FIT is ONE distributed pass: per-partition accumulation of (n, Σx,
  *     Σxxᵀ) over primitive arrays, combined with `treeAggregate` — the
  *     driver ever holds only dim + dim² doubles (a 4096-dim corpus ⇒
  *     ~134 MB, independent of row count), then a dim³ symmetric
  *     eigendecomposition locally.
  *   - PROJECT is map-side: k dot products per row against the component
  *     literals, built from the same codegen'd dot-product expression the
  *     rest of the similarity stack uses ([[Similarity.dot]]). No shuffle
  *     on either side.
  *
  * Determinism: eigenvector signs are canonicalized (largest-magnitude
  * coordinate positive), so refits on the same data produce the same
  * projection up to float-sum reassociation across partitions (~1e-6
  * relative — fine for ANN, which is why PCA is spec-gated rather than
  * hash-gated).
  */
object Pca {

  /** `components`: k rows of length dim, orthonormal, by decreasing
    * eigenvalue; `explainedVariance`: the matching eigenvalues (variance
    * along each component).
    */
  final case class PcaModel(
      mean: Array[Double],
      components: Array[Array[Double]],
      explainedVariance: Array[Double]) {
    def dim: Int = mean.length
    def k: Int = components.length
  }

  /** Fit a k-component PCA over `vecCol` (array of float/double) in one
    * distributed pass.
    */
  def fit(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    require(k > 0, "k must be positive")
    val rows = df
      .select(col(vecCol).cast("array<double>"))
      .na.drop()
      .rdd
      .map(_.getSeq[Double](0).toArray)

    // (n, sum, upper-triangular sum of outer products), primitive arrays
    type Acc = (Long, Array[Double], Array[Double])
    def newAcc(dim: Int): Acc =
      (0L, new Array[Double](dim), new Array[Double](dim * (dim + 1) / 2))
    def add(acc: Acc, x: Array[Double]): Acc = {
      val (n, s, o) = if (acc._2.length == 0) newAcc(x.length) else acc
      var i = 0
      var t = 0
      while (i < x.length) {
        s(i) += x(i)
        var j = i
        while (j < x.length) { o(t) += x(i) * x(j); t += 1; j += 1 }
        i += 1
      }
      (n + 1, s, o)
    }
    def merge(a: Acc, b: Acc): Acc =
      if (a._2.length == 0) b
      else if (b._2.length == 0) a
      else {
        var i = 0
        while (i < a._2.length) { a._2(i) += b._2(i); i += 1 }
        var t = 0
        while (t < a._3.length) { a._3(t) += b._3(t); t += 1 }
        (a._1 + b._1, a._2, a._3)
      }
    val (n, sum, outer) =
      rows.treeAggregate(newAcc(0))(add, merge)
    require(n > 1, s"PCA needs at least 2 rows, got $n")
    val dim = sum.length
    require(k <= dim, s"k=$k exceeds embedding dim=$dim")

    val mean = sum.map(_ / n)
    // covariance = E[xxᵀ] − μμᵀ (population; the scaling cancels in the
    // eigenvectors and keeps eigenvalues interpretable as variance)
    val cov = DenseMatrix.zeros[Double](dim, dim)
    var i = 0
    var t = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = outer(t) / n - mean(i) * mean(j)
        cov(i, j) = c
        cov(j, i) = c
        t += 1
        j += 1
      }
      i += 1
    }
    val es = eigSym(cov) // ascending eigenvalues
    val order = (0 until dim).sortBy(idx => -es.eigenvalues(idx)).take(k)
    val components = order.map { idx =>
      val v = es.eigenvectors(::, idx)
      // canonical sign: largest-|coordinate| positive
      val lead = (0 until dim).maxBy(d => math.abs(v(d)))
      val sgn = if (v(lead) < 0) -1.0 else 1.0
      Array.tabulate(dim)(d => v(d) * sgn)
    }.toArray
    PcaModel(
      mean,
      components,
      order.map(idx => math.max(es.eigenvalues(idx), 0.0)).toArray)
  }

  /** Project `vecCol` onto the model's components — an `array<double>` of
    * length k, map-side (k codegen'd dot products against float component
    * literals after mean-centering folds into a per-component offset:
    * (x − μ)·c = x·c − μ·c). Components are truncated to float for the
    * codegen'd dot — immaterial at ANN precision.
    */
  def project(model: PcaModel, vecCol: Column): Column = {
    val comps = model.components.map { c =>
      val offset = c.zip(model.mean).map { case (ci, mi) => ci * mi }.sum
      Similarity.dot(
        vecCol.cast("array<float>"),
        typedLit(c.map(_.toFloat).toSeq)) - lit(offset)
    }
    array(comps: _*)
  }

  /** One-call convenience: fit on `df` itself and append the projection as
    * `outCol`.
    */
  def reduce(
      df: DataFrame,
      vecCol: String,
      k: Int,
      outCol: String = "pca"): DataFrame =
    df.withColumn(outCol, project(fit(df, vecCol, k), col(vecCol)))
}
