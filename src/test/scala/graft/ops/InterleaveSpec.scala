package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Packing.interleaveBySource]]: position bijection, per-source order
  * preservation, the every-prefix proportionality guarantee, and
  * partitioning invariance.
  */
class InterleaveSpec extends SparkSpec {
  import spark.implicits._

  // 70 / 20 / 10 split over 100 rows
  private val rows = (0L until 100L).map { i =>
    val src = if (i % 10 < 7) "s0" else if (i % 10 < 9) "s1" else "s2"
    (i, src)
  }

  private def run(repart: Int = 0): Seq[(Long, String, Long)] = {
    val df0 = rows.toDF("id", "source")
    val df = if (repart > 0) df0.repartition(repart) else df0
    Packing
      .interleaveBySource(df, "id", "source")
      .select(col("id"), col("source"), col("pos"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq
  }

  test("positions are a 0..n-1 bijection") {
    val pos = run().map(_._3)
    pos.sorted shouldBe (0L until 100L)
  }

  test("every prefix holds each source at its proportion (the 1 + S*share bound)") {
    val bySource = Map("s0" -> 0.7, "s1" -> 0.2, "s2" -> 0.1)
    val ordered = run().sortBy(_._3)
    for (m <- 1 to 100; (src, share) <- bySource) {
      val got = ordered.take(m).count(_._2 == src)
      val expected = m * share
      val bound = 1.0 + bySource.size * share // scaladoc'd deviation bound
      assert(
        math.abs(got - expected) <= bound + 1e-9,
        s"prefix $m has $got of $src, expected $expected +- $bound")
    }
  }

  test("per-source hashed order is preserved in the global order") {
    val hashOf = rows
      .map(_._1)
      .toDF("id")
      .select(
        col("id"),
        TextFunctions
          .hash61(concat(lit("interleave:"), col("id").cast("string")))
          .as("h"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val ordered = run().sortBy(_._3)
    for (src <- Seq("s0", "s1", "s2")) {
      val h = ordered.filter(_._2 == src).map(t => (hashOf(t._1), t._1))
      h shouldBe h.sorted
    }
  }

  test("result is invariant under adversarial repartitioning") {
    run(repart = 7).toSet shouldBe run().toSet
  }

  test("helper-column collisions are rejected loudly") {
    an[IllegalArgumentException] should be thrownBy
      Packing.interleaveBySource(
        rows.toDF("id", "source").withColumn("__il_p", lit(1)),
        "id",
        "source")
  }
}
