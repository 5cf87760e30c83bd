package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val rows =
    Seq.fill(500)("hot") ++ Seq.fill(120)("warm") ++
      (0 until 300).map(i => s"tail_$i")

  private def exact = Map("hot" -> 500L, "warm" -> 120L, "absent" -> 0L,
    "tail_7" -> 1L)

  test("estimates overcount, never undercount") {
    val df = rows.toDF("k")
    val sk = CountMin.sketch(df, $"k", width = 256, depth = 3)
    val probe = exact.keys.toSeq.toDF("k")
    val est = CountMin
      .estimates(sk, probe, "k", width = 256, depth = 3)
      .as[(String, Long)]
      .collect()
      .toMap
    for ((k, truth) <- exact) {
      est(k) should be >= truth
      // min over 3 rows of expected n/256 overflow: generous slack
      est(k) should be <= (truth + 60L)
    }
  }

  test("linear sketch: estimates identical across partitionings") {
    val probe = exact.keys.toSeq.toDF("k")
    def run(parts: Int) = CountMin
      .estimates(
        CountMin.sketch(rows.toDF("k").repartition(parts), $"k", 128, 2),
        probe,
        "k",
        128,
        2)
      .as[(String, Long)]
      .collect()
      .toMap
    run(1) shouldBe run(16)
  }

  test("sketch size is capped by width x depth") {
    val sk = CountMin.sketch(rows.toDF("k"), $"k", width = 64, depth = 2)
    sk.count() should be <= (64L * 2)
    // total mass per depth row = n
    sk.groupBy("r").sum("cnt").as[(Int, Long)].collect().toMap
      .values.toSet shouldBe Set(rows.size.toLong)
  }
}
