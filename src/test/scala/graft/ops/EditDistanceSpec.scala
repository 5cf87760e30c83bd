package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Dedup.editDistancePairs]]: losslessness against an in-test naive
  * all-pairs Levenshtein, both radii, degenerate inputs, and partitioning
  * invariance.
  */
class EditDistanceSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def naive(
      rows: Seq[(Long, String)],
      k: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, ta) <- rows
      (ib, tb) <- rows
      if ia < ib
      d = lev(ta, tb)
      if d <= k
    } yield (ia, ib, d)).toSet

  private val corpus = Seq(
    1L -> "spark sql",
    2L -> "spark sqk", // substitution of 1
    3L -> "spark sq", // deletion of 1
    4L -> "sparks sql", // insertion of 1
    5L -> "spark sql", // exact duplicate of 1 (distance 0)
    6L -> "flink table", // unrelated
    7L -> "flink tably", // substitution of 6
    8L -> "park sqk", // distance 2 from 1 (del + sub)
    9L -> "", // empty string
    10L -> "a") // near-empty

  private def run(k: Int, repart: Int = 0): Set[(Long, Long, Int)] = {
    val df0 = corpus.toDF("id", "t")
    val df = if (repart > 0) df0.repartition(repart) else df0
    Dedup.editDistancePairs(df, "id", col("t"), maxDist = k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
  }

  test("k=1 matches the naive all-pairs Levenshtein exactly (lossless)") {
    val got = run(1)
    got shouldBe naive(corpus, 1)
    // the planted relationships are all present
    got should contain allOf ((1L, 2L, 1), (1L, 3L, 1), (1L, 4L, 1),
      (1L, 5L, 0), (6L, 7L, 1), (9L, 10L, 1))
    // distance-2 pair excluded at k=1
    got.map(p => (p._1, p._2)) should not contain ((1L, 8L))
  }

  test("k=2 matches the naive all-pairs Levenshtein exactly") {
    val got = run(2)
    got shouldBe naive(corpus, 2)
    got should contain((1L, 8L, 2))
  }

  test("result is invariant under adversarial repartitioning") {
    run(1, repart = 7) shouldBe run(1)
  }

  test("radii outside {1, 2} are rejected loudly") {
    an[IllegalArgumentException] should be thrownBy
      Dedup.editDistancePairs(corpus.toDF("id", "t"), "id", col("t"), 3)
    an[IllegalArgumentException] should be thrownBy
      Dedup.editDistancePairs(corpus.toDF("id", "t"), "id", col("t"), 0)
  }
}
