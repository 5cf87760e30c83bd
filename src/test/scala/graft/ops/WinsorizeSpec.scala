package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Sampling.winsorize]]: hand-computed clamps, row preservation,
  * partitioning invariance.
  */
class WinsorizeSpec extends SparkSpec {
  import spark.implicits._

  // group g: values 1..8 -> q=0.125 rank ceil(0.125*8)=1 -> lo=1
  //                         q=0.875 rank ceil(0.875*8)=7 -> hi=7
  private val rows =
    (1L to 8L).map(i => ("g", i, i * 10L)) ++
      Seq(("h", 100L, 5L), ("h", 101L, 500L))

  test("clamps into the exact per-group quantile band") {
    val got = Sampling.winsorize(
      rows.toDF("lang", "doc_id", "score"),
      Seq("lang"), "doc_id", col("score"), 0.125, 0.875)
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("clipped")))
      .toSet
    // g: lo=10, hi=70 -> 80 clips to 70, the rest unchanged
    val gExpected = (1L to 8L).map(i => ("g", i, math.min(i * 10L, 70L))).toSet
    // h (n=2): lo = rank ceil(.125*2)=1 -> 5; hi = rank ceil(.875*2)=2 -> 500
    val hExpected = Set(("h", 100L, 5L), ("h", 101L, 500L))
    got shouldBe (gExpected ++ hExpected)
  }

  test("preserves row count and is partitioning-invariant") {
    val df = rows.toDF("lang", "doc_id", "score")
    val a = Sampling.winsorize(df, Seq("lang"), "doc_id", col("score"),
      0.125, 0.875).collect().map(_.toString).sorted
    val b = Sampling.winsorize(df.repartition(5), Seq("lang"), "doc_id",
      col("score"), 0.125, 0.875).collect().map(_.toString).sorted
    a.length shouldBe rows.length
    a shouldBe b
  }

  test("rejects a degenerate band") {
    an[IllegalArgumentException] should be thrownBy
      Sampling.winsorize(rows.toDF("lang", "doc_id", "score"),
        Seq("lang"), "doc_id", col("score"), 0.9, 0.1)
  }
}
