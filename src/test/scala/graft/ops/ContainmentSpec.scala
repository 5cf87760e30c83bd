package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Dedup.containmentPairs]]: losslessness against an in-test naive
  * all-pairs computation, the doc-in-doc case jaccard misses, and
  * partitioning invariance.
  */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private def naive(
      docs: Seq[(Long, String)],
      n: Int,
      tppm: Long): Set[(Long, Long, Long, Long)] = {
    def sh(t: String): Set[String] =
      t.trim.split("\\s+").sliding(n).filter(_.length == n)
        .map(_.mkString(" ")).toSet
    val sets = docs.map { case (id, t) => id -> sh(t) }.filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets
      (ib, sb) <- sets
      if ia != ib
      inter = (sa intersect sb).size.toLong
      if inter * 1000000L >= tppm * sa.size
    } yield (ia, ib, inter, sa.size.toLong)).toSet
  }

  private val corpus = Seq(
    // B = long doc; A = exact excerpt of B (containment 1.0, jaccard low)
    1L -> "the quick brown fox jumps over the lazy dog while rain falls on the quiet town every evening",
    2L -> "fox jumps over the lazy dog",
    // unrelated
    3L -> "completely different words about ships and harbors at dawn",
    // partial overlap with 1
    4L -> "rain falls on the quiet town every evening somewhere else entirely",
    // too short for 3-shingles
    5L -> "tiny doc")

  test("matches the naive all-pairs containment exactly (lossless)") {
    val got = Dedup.containmentPairs(
      corpus.toDF("doc_id", "text"), "doc_id", "text",
      n = 3, thresholdPpm = 500000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    got shouldBe naive(corpus, 3, 500000L)
    // the doc-in-doc direction is present: A=2 inside B=1
    got.map(p => (p._1, p._2)) should contain((2L, 1L))
    // and is directional: B=1 is NOT contained in A=2
    got.map(p => (p._1, p._2)) should not contain ((1L, 2L))
  }

  test("containment_ppm is the exact integer ratio") {
    val row = Dedup.containmentPairs(
      corpus.toDF("doc_id", "text"), "doc_id", "text",
      n = 3, thresholdPpm = 500000L)
      .filter(col("id_a") === 2L && col("id_b") === 1L)
      .collect()(0)
    // doc 2 (6 words) has 4 distinct 3-shingles, all inside doc 1
    row.getLong(2) shouldBe 4L
    row.getLong(3) shouldBe 4L
    row.getLong(4) shouldBe 1000000L
  }

  test("partitioning-invariant") {
    val df = corpus.toDF("doc_id", "text")
    val a = Dedup.containmentPairs(df, "doc_id", "text", 3, 500000L)
      .collect().map(_.toString).sorted
    val b = Dedup.containmentPairs(df.repartition(5), "doc_id", "text", 3, 500000L)
      .collect().map(_.toString).sorted
    a shouldBe b
  }

  test("exact duplicates appear in both directions at 1.0") {
    val dup = Seq(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta epsilon")
    val got = Dedup.containmentPairs(
      dup.toDF("doc_id", "text"), "doc_id", "text", 3, 800000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    got shouldBe Set((1L, 2L, 1000000L), (2L, 1L, 1000000L))
  }
}
