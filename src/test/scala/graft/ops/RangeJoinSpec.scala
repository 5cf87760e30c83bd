package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketized point-in-interval join ([[RangeJoin]]): exact equivalence
  * with the naive cross-join filter under any bucket width, floor-division
  * correctness on negatives, key restriction, and null/empty handling.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def refHash(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 12), 16)
  }

  // deterministic fixture straddling zero: points in [-500, 500],
  // intervals of widths 0..120 (some empty via lo > hi)
  private lazy val points: DataFrame =
    (0 until 80)
      .map(i => (i.toLong, refHash(s"p$i") % 1001L - 500L))
      .toDF("pid", "p")
  private lazy val intervals: DataFrame =
    (0 until 40).map { j =>
      val lo = refHash(s"lo$j") % 901L - 450L
      val w = refHash(s"w$j") % 121L - 10L // negative width -> empty
      (j.toLong, lo, lo + w)
    }.toDF("iid", "lo", "hi")

  private def naive: Set[(Long, Long)] =
    points
      .crossJoin(intervals)
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

  private def bucketed(bucket: Long): Set[(Long, Long)] =
    RangeJoin
      .pointInInterval(points, "p", intervals, "lo", "hi", bucket)
      .select("pid", "iid")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

  test("bucketized join equals the naive join for any bucket width") {
    val expected = naive
    expected should not be empty // fixture must actually exercise matches
    for (b <- Seq(1L, 7L, 64L, 1000L, 1000000L))
      withClue(s"bucket $b: ") { bucketed(b) shouldBe expected }
  }

  test("floorDiv floors toward negative infinity") {
    val got = Seq(-7L, -6L, -1L, 0L, 1L, 5L, 6L)
      .toDF("x")
      .select(RangeJoin.floorDiv(col("x"), 3L).as("d"))
      .collect()
      .map(_.getLong(0))
      .toSeq
    got shouldBe Seq(-3L, -2L, -1L, 0L, 0L, 1L, 2L)
  }

  test("boundary points match inclusively on both ends") {
    val pts = Seq((1L, 10L), (2L, 20L), (3L, 9L), (4L, 21L))
      .toDF("pid", "p")
    val ivs = Seq((7L, 10L, 20L)).toDF("iid", "lo", "hi")
    val got = RangeJoin
      .pointInInterval(pts, "p", ivs, "lo", "hi", bucket = 4L)
      .select("pid")
      .collect()
      .map(_.getLong(0))
      .toSet
    got shouldBe Set(1L, 2L)
  }

  test("exact keys restrict matches") {
    val pts = Seq((1L, 5L, "a"), (2L, 5L, "b")).toDF("pid", "p", "pk")
    val ivs = Seq((7L, 0L, 10L, "a")).toDF("iid", "lo", "hi", "ik")
    val got = RangeJoin
      .pointInInterval(
        pts, "p", ivs, "lo", "hi", bucket = 3L, keys = Seq(("pk", "ik")))
      .select("pid")
      .collect()
      .map(_.getLong(0))
      .toSet
    got shouldBe Set(1L)
  }

  test("null range values and empty intervals match nothing") {
    val pts = Seq(
      (1L, Some(5L)),
      (2L, None): (Long, Option[Long])).toDF("pid", "p")
    val ivs = Seq(
      (7L, Some(0L), Some(10L)),
      (8L, Some(10L), Some(0L)), // empty
      (9L, None, Some(10L)): (Long, Option[Long], Option[Long]))
      .toDF("iid", "lo", "hi")
    val got = RangeJoin
      .pointInInterval(pts, "p", ivs, "lo", "hi", bucket = 5L)
      .select("pid", "iid")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    got shouldBe Set((1L, 7L))
  }

  test("open-ended sentinel intervals raise loudly instead of exploding") {
    import spark.implicits._
    val pts = Seq((1L, 100L)).toDF("pid", "p")
    val openEnded = Seq((7L, 0L, Long.MaxValue)).toDF("iid", "lo", "hi")
    val ex = intercept[Throwable] {
      RangeJoin
        .pointInInterval(pts, "p", openEnded, "lo", "hi", bucket = 16L)
        .collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage} | ${chain(t.getCause)}"
    chain(ex) should include("buckets of width")
    // a wide-but-legal interval under a raised cap still works
    val wide = Seq((8L, 0L, 1000L)).toDF("iid", "lo", "hi")
    RangeJoin
      .pointInInterval(pts, "p", wide, "lo", "hi", bucket = 16L,
        maxReplication = 1000L)
      .count() shouldBe 1L
  }

  test("result is invariant to input partitioning") {
    val expected = bucketed(16L)
    val got = RangeJoin
      .pointInInterval(
        points.repartition(13), "p",
        intervals.repartition(5), "lo", "hi", 16L)
      .select("pid", "iid")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    got shouldBe expected
  }
}
