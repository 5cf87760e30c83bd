package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // 3 hot keys (1200/800/500) + a 1000-key uniform tail (2 each): n = 4500
  private def corpus(parts: Int) = {
    val rows =
      Seq.fill(1200)("hot_a") ++ Seq.fill(800)("hot_b") ++
        Seq.fill(500)("hot_c") ++
        (0 until 1000).flatMap(i => Seq(s"tail_$i", s"tail_$i"))
    rows.toDF("key").repartition(parts)
  }

  private def exactCounts = Map("hot_a" -> 1200L, "hot_b" -> 800L,
    "hot_c" -> 500L) ++ (0 until 1000).map(i => s"tail_$i" -> 2L)

  test("MG invariants hold regardless of partitioning") {
    for (parts <- Seq(1, 4, 16)) {
      val s = HeavyHitters.sketch(corpus(parts), col("key"), k = 20)
      s.n shouldBe 4500L
      // error bound: err <= n/(k+1)
      s.err should be <= (4500L / 21)
      // every key with true count > n/(k+1) must be present
      for ((key, c) <- exactCounts if c > s.err)
        s.counts.keySet should contain(key)
      // estimates undercount, within err
      for ((key, est) <- s.counts) {
        val truth = exactCounts(key)
        est should be <= truth
        (truth - est) should be <= s.err
      }
      // summary never exceeds k entries
      s.counts.size should be <= 20
    }
  }

  test("topK dataframe carries the same bounds") {
    val df = HeavyHitters.topK(corpus(8), col("key"), k = 10)
    df.columns.toSeq shouldBe Seq("key", "est_count", "err", "n")
    val rows = df.as[(String, Long, Long, Long)].collect()
    rows.map(_._4).toSet shouldBe Set(4500L)
    val err = rows.head._3
    Seq("hot_a", "hot_b", "hot_c").foreach { hot =>
      rows.map(_._1) should contain(hot)
    }
    rows.foreach { case (key, est, _, _) =>
      est should be <= exactCounts(key)
    }
    err should be <= (4500L / 11)
  }

  test("nulls are skipped, k larger than distinct keys is exact") {
    val df = Seq(Some("a"), Some("a"), Some("b"), None)
      .toDF("key")
    val s = HeavyHitters.sketch(df, col("key"), k = 10)
    s.n shouldBe 3L
    s.err shouldBe 0L
    s.counts shouldBe Map("a" -> 2L, "b" -> 1L)
  }
}
