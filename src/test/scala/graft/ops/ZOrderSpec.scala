package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue2 interleaves bits (a even positions, b odd)") {
    // a=5 (101), b=3 (011), 3 bits:
    //   pos0=a0=1, pos1=b0=1, pos2=a1=0, pos3=b1=1, pos4=a2=1, pos5=b2=0
    //   = 1 + 2 + 8 + 16 = 27
    val got = Seq((5L, 3L))
      .toDF("a", "b")
      .select(ZOrder.zValue2($"a", $"b", bits = 3))
      .as[Long]
      .head()
    got shouldBe 27L
  }

  test("zValue masks to the low `bits` bits") {
    // a=9 (1001) with 3 bits behaves as a=1
    val pair = Seq((9L, 1L, 0L))
      .toDF("a9", "a1", "z")
      .select(
        ZOrder.zValue(Seq($"a9", $"z"), bits = 3),
        ZOrder.zValue(Seq($"a1", $"z"), bits = 3))
      .as[(Long, Long)]
      .head()
    pair._1 shouldBe pair._2
  }

  test("zValue of three columns round-robins bit positions") {
    // a=1, b=1, c=1, 2 bits: bits 0,1,2 set -> 7
    Seq((1L, 1L, 1L))
      .toDF("a", "b", "c")
      .select(ZOrder.zValue(Seq($"a", $"b", $"c"), bits = 2))
      .as[Long]
      .head() shouldBe 7L
  }

  test("z-ranged partitions prune on the TRAILING key, plain sort doesn't") {
    // 64x64 grid; 16 range partitions. A file-skipping reader prunes a
    // partition when the predicate misses its [min, max] of the column.
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
      .repartition(8) // arbitrary incoming layout
    def overlapping(df: org.apache.spark.sql.DataFrame): Long = {
      val stats = df
        .withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(min($"y").as("lo"), max($"y").as("hi"))
      stats.filter($"lo" <= 11 && $"hi" >= 8).count()
    }
    val z = overlapping(
      ZOrder.zorderRepartition(grid, Seq("x", "y"), bits = 6, numPartitions = 16))
    val plain = overlapping(
      grid.repartitionByRange(16, $"x", $"y"))
    // plain range layout leads on x: every partition spans all of y
    plain shouldBe 16L
    // z-order keeps y-locality too: the narrow y-band touches few parts
    z should be <= 8L
  }
}
