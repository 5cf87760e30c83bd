package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Quantize.mipsTopK]]: magnitude-sensitive ranking (the case cosine
  * gets wrong), determinism, and self-exclusion.
  */
class MipsSpec extends SparkSpec {
  import spark.implicits._

  // query q = [1, 0]; a = same direction, small magnitude; b = slightly
  // off-direction, large magnitude. Cosine ranks a first; MIPS must rank
  // b first (q·b = 10 > q·a = 1).
  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f)),
    (1L, Array(1.0f, 0.0f)),
    (2L, Array(10.0f, 3.0f))).toDF("vec_id", "embedding")

  test("ranks by inner product, not cosine") {
    val q = vecs.filter(col("vec_id") === 0L)
    val mips = Quantize.mipsTopK(
      vecs, "vec_id", "embedding", q, "vec_id", "embedding", k = 2)
      .orderBy(col("rank")).collect().map(_.getLong(1)).toSeq
    mips shouldBe Seq(2L, 1L)
    val cos = Quantize.quantizedTopK(
      vecs, "vec_id", "embedding", q, "vec_id", "embedding", k = 2)
      .orderBy(col("rank")).collect().map(_.getLong(1)).toSeq
    cos shouldBe Seq(1L, 2L) // cosine prefers the aligned small vector
  }

  test("excludes self and is partitioning-invariant") {
    val big = (0L until 100L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 7 + d) % 13).toFloat - 6f)))
      .toDF("vec_id", "embedding")
    val q = big.filter(col("vec_id") < 5)
    val a = Quantize.mipsTopK(big, "vec_id", "embedding", q,
      "vec_id", "embedding", k = 3).collect()
    a.foreach(r => r.getLong(0) should not be r.getLong(1))
    val b = Quantize.mipsTopK(big.repartition(7), "vec_id", "embedding", q,
      "vec_id", "embedding", k = 3).collect()
    a.map(_.toString).sorted shouldBe b.map(_.toString).sorted
  }
}
