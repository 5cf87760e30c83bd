package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TextFunctions.compressionRatioPpm]] (JVM-deterministic [T] signal)
  * and [[Packing.shardManifest]].
  */
class CompressionManifestSpec extends SparkSpec {
  import spark.implicits._

  private def ratio(s: String): Long =
    Seq(s).toDF("t")
      .select(TextFunctions.compressionRatioPpm(col("t")))
      .collect()(0).getLong(0)

  test("repetitive text compresses far better than diverse text") {
    val boiler = "cookie policy " * 200
    val diverse = (1 to 400).map(i => s"w${i * 7919}").mkString(" ")
    val rb = ratio(boiler)
    val rd = ratio(diverse)
    rb should be < 100000L // near-pure repetition
    rd should be > rb * 5
  }

  test("deterministic across partitionings and repeated evaluation") {
    val docs = (1 to 50).map(i => (i.toLong, s"text $i " * (i % 7 + 1))).toDF("id", "t")
    val a = docs.select(col("id"), TextFunctions.compressionRatioPpm(col("t")))
      .collect().map(_.toString).sorted
    val b = docs.repartition(7)
      .select(col("id"), TextFunctions.compressionRatioPpm(col("t")))
      .collect().map(_.toString).sorted
    a shouldBe b
  }

  test("empty text maps to the neutral 1e6") {
    ratio("") shouldBe 1000000L
  }

  test("shardManifest fingerprints membership, not row order") {
    val df = Seq(
      (0, 1L, 10L), (0, 2L, 20L), (1, 3L, 5L)).toDF("shard", "id", "w")
    val m = Packing.shardManifest(df, "shard", "id", col("w"))
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    m(0)._1 shouldBe 2L
    m(0)._2 shouldBe 30L
    m(1)._1 shouldBe 1L
    // order-insensitive: reversed input rows produce the same fingerprint
    val m2 = Packing.shardManifest(
      df.orderBy(col("id").desc).repartition(3), "shard", "id", col("w"))
      .collect()
      .map(r => r.getInt(0) -> r.getString(3)).toMap
    m2(0) shouldBe m(0)._3
    // membership change flips the fingerprint
    val m3 = Packing.shardManifest(
      df.filter(col("id") =!= 2L), "shard", "id", col("w"))
      .collect().map(r => r.getInt(0) -> r.getString(3)).toMap
    m3(0) should not be m(0)._3
  }
}
