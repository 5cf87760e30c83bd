package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random doubles (no java Random — reproducible
  // across JVMs by construction)
  private def noise(i: Int, j: Int): Double =
    (((i * 1103515245L + j * 12345L + 42L) % 1000L) / 1000.0 - 0.5)

  test("recovers a 2-dim subspace embedded in 6 dims") {
    // points = a*u + b*v with orthogonal u, v — variance lives entirely in
    // span(u, v), so 2 components reconstruct pairwise geometry exactly
    val u = Array(1.0, 0, 0, 1.0, 0, 0).map(_ / math.sqrt(2))
    val v = Array(0, 1.0, 0, 0, -1.0, 0).map(_ / math.sqrt(2))
    val pts = (0 until 200).map { i =>
      val a = noise(i, 1) * 10
      val b = noise(i, 2) * 4
      (i.toLong, Array.tabulate(6)(d => (a * u(d) + b * v(d)).toFloat))
    }
    val df = pts.toDF("id", "vec")
    val m = Pca.fit(df, "vec", 2)

    m.k shouldBe 2
    m.dim shouldBe 6
    // top-2 variance captures everything; the rest is numerically zero
    val full = Pca.fit(df, "vec", 6)
    val total = full.explainedVariance.sum
    (m.explainedVariance.sum / total) shouldBe 1.0 +- 1e-9
    m.explainedVariance(0) should be >= m.explainedVariance(1)

    // projection preserves pairwise distances (isometry on the subspace)
    val proj = df
      .withColumn("p", Pca.project(m, col("vec")))
      .orderBy("id")
      .collect()
      .map(_.getSeq[Double](2).toArray)
    def d2(x: Array[Float], y: Array[Float]): Double =
      x.zip(y).map { case (a, b) => (a - b) * (a - b) }.map(_.toDouble).sum
    def p2(x: Array[Double], y: Array[Double]): Double =
      x.zip(y).map { case (a, b) => (a - b) * (a - b) }.sum
    for (i <- 0 until 20; j <- (i + 1) until 20) {
      p2(proj(i), proj(j)) shouldBe
        d2(pts(i)._2, pts(j)._2) +- 1e-3
    }
  }

  test("fit is reproducible and sign-canonicalized") {
    val pts = (0 until 100).map { i =>
      (i.toLong, Array.tabulate(4)(d => noise(i, d).toFloat))
    }
    val df = pts.toDF("id", "vec")
    val a = Pca.fit(df, "vec", 3)
    val b = Pca.fit(df, "vec", 3)
    a.components.flatMap(_.toSeq).zip(b.components.flatMap(_.toSeq)).foreach {
      case (x, y) => x shouldBe y +- 1e-12
    }
    // canonical sign: each component's largest-|coordinate| is positive
    a.components.foreach { c =>
      c(c.indices.maxBy(d => math.abs(c(d)))) should be >= 0.0
    }
  }

  test("PCA-reduced vectors preserve brute-force cosine top-1 on clustered data") {
    // three well-separated direction clusters in 8 dims; after a 3-dim PCA
    // the nearest neighbor by cosine must be a same-cluster vector
    val dirs = Seq(
      Array(1.0, 0, 0, 0, 0, 0, 0, 0),
      Array(0, 0, 1.0, 0, 0, 0, 0, 0),
      Array(0, 0, 0, 0, 0, 1.0, 0, 0))
    val pts = (0 until 90).map { i =>
      val c = i % 3
      val v = Array.tabulate(8)(d => dirs(c)(d) + 0.05 * noise(i, d))
      (i.toLong, c, v.map(_.toFloat))
    }
    val df = pts.toDF("id", "cluster", "vec")
    val m = Pca.fit(df, "vec", 3)
    val reduced = df
      .withColumn("rvec", Pca.project(m, col("vec")).cast("array<float>"))
      .select(col("id"), col("cluster"), col("rvec"))
    val queries = reduced
      .filter(col("id") < 3)
      .select(col("id").as("qid"), col("rvec").as("qvec"))
    val top = Similarity
      .bruteForceTopK(
        reduced.filter(col("id") >= 3), "id", "rvec",
        queries, "qid", "qvec", k = 1)
      .collect()
    top.length shouldBe 3
    // neighbor cluster == query cluster (ids 0,1,2 are clusters 0,1,2)
    top.foreach { r =>
      val qid = r.getLong(0)
      val nid = r.getLong(1)
      (nid % 3) shouldBe (qid % 3)
    }
  }

  test("reduce appends the projection column; invalid k rejected") {
    val df = (0 until 10)
      .map(i => (i.toLong, Array.tabulate(3)(d => noise(i, d).toFloat)))
      .toDF("id", "vec")
    val out = Pca.reduce(df, "vec", 2)
    out.columns.toSeq shouldBe Seq("id", "vec", "pca")
    out
      .select(org.apache.spark.sql.functions.size(col("pca")).as("n"))
      .distinct()
      .collect()
      .head
      .getInt(0) shouldBe 2
    an[IllegalArgumentException] should be thrownBy Pca.fit(df, "vec", 0)
    an[IllegalArgumentException] should be thrownBy Pca.fit(df, "vec", 9)
  }
}
