package graft.ops

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class OutliersSpec extends SparkSpec {
  import spark.implicits._

  private def run(
      df: DataFrame,
      groups: Seq[String],
      num: Long,
      den: Long): Map[Long, (Long, Boolean)] =
    Outliers
      .centroidOutliers(df, "vec_id", "embedding", groups, num, den)
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("cdot"), r.getAs[Boolean]("is_outlier"))))
      .toMap

  test("coherent vectors pass, the anti-aligned one is flagged") {
    // group: three near-identical vectors and one pointing the other way.
    // centroid ≈ (1, 0); cos(v4, centroid) < 0 -> outlier at any threshold.
    val df = Seq(
      (1L, Array(1.0f, 0.1f), "a"),
      (2L, Array(1.0f, 0.0f), "a"),
      (3L, Array(1.0f, -0.1f), "a"),
      (4L, Array(-1.0f, 0.05f), "a"))
      .toDF("vec_id", "embedding", "label")
    val out = run(df, Seq("label"), 1, 2) // threshold 0.5
    out(1L)._2 shouldBe false
    out(2L)._2 shouldBe false
    out(3L)._2 shouldBe false
    out(4L)._2 shouldBe true
    out(4L)._1 should be < 0L // anti-aligned integer dot is negative
  }

  test("groups get independent centroids") {
    // the same vector is an inlier in its own group, outlier in a group
    // centered on the opposite direction
    val df = Seq(
      (1L, Array(1.0f, 0.0f), "pos"),
      (2L, Array(1.0f, 0.02f), "pos"),
      (3L, Array(-1.0f, 0.0f), "neg"),
      (4L, Array(-1.0f, 0.02f), "neg"),
      (5L, Array(1.0f, 0.0f), "neg")) // aligned with "pos", lives in "neg"
      .toDF("vec_id", "embedding", "label")
    val out = run(df, Seq("label"), 1, 2)
    out(1L)._2 shouldBe false
    out(5L)._2 shouldBe true
  }

  test("the zero vector is always an outlier; global centroid works") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = run(df, Seq.empty, 1, 10)
    out(3L) shouldBe ((0L, true))
    out(1L)._2 shouldBe false
    // internal sentinel group column must not leak into the output
    Outliers
      .centroidOutliers(df, "vec_id", "embedding", Seq.empty, 1, 10)
      .columns.toSeq shouldBe Seq("vec_id", "cdot", "nv", "nc", "is_outlier")
  }

  test("decision is invariant under input partitioning (integer sums)") {
    val vecs = (1L to 200L).map { i =>
      val angle = (i % 40).toDouble / 40.0 * math.Pi
      (i, Array(math.cos(angle).toFloat, math.sin(angle).toFloat), s"g${i % 3}")
    }
    def at(parts: Int) = run(
      vecs.toDF("vec_id", "embedding", "label").repartition(parts),
      Seq("label"), 3, 10)
    at(1) shouldBe at(13)
  }

  test("non-positive thresholds are rejected") {
    val df = Seq((1L, Array(1.0f))).toDF("vec_id", "embedding")
    an[IllegalArgumentException] should be thrownBy
      Outliers.centroidOutliers(df, "vec_id", "embedding", Nil, 0, 10)
    an[IllegalArgumentException] should be thrownBy
      Outliers.centroidOutliers(df, "vec_id", "embedding", Nil, 1, -1)
  }
}
