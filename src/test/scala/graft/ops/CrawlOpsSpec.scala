package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r10 crawl/curation ops: [[Dedup.exactKeepBest]], [[Urls.fetchSlots]],
  * [[Vocab.oovReport]].
  */
class CrawlOpsSpec extends SparkSpec {
  import spark.implicits._

  test("exactKeepBest keeps the max-score copy, min id on ties") {
    val docs = Seq(
      (1L, "dup", 5L), (2L, "dup", 9L), (3L, "dup", 9L), // max 9, tie -> id 2
      (4L, "solo", 1L)).toDF("id", "text", "sc")
    val got = Dedup.exactKeepBest(docs, "id", "text", col("sc"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    got shouldBe Set((2L, 9L, 3L), (4L, 1L, 1L))
  }

  test("exactKeepBest is partitioning-invariant (partial-agg argmax)") {
    val docs = (1L to 200L).map(i => (i, s"content${i % 20}", i % 7)).toDF("id", "text", "sc")
    val a = Dedup.exactKeepBest(docs, "id", "text", col("sc"))
      .collect().map(_.toString).sorted
    val b = Dedup.exactKeepBest(docs.repartition(13), "id", "text", col("sc"))
      .collect().map(_.toString).sorted
    a shouldBe b
  }

  test("resolveRedirects follows chains to the terminal with exact hops") {
    val m = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val out = Urls.resolveRedirects(m, "src", "dst", maxHops = 8)
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    out("a") shouldBe (("d", 3L, 1L))
    out("b") shouldBe (("d", 2L, 1L))
    out("c") shouldBe (("d", 1L, 1L))
  }

  test("resolveRedirects: cycles and over-cap chains land at exactly maxHops") {
    val cyc = Seq(("x", "y"), ("y", "x")).toDF("src", "dst")
    val c = Urls.resolveRedirects(cyc, "src", "dst", maxHops = 4)
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    c("x") shouldBe (("x", 4L, 0L)) // 4 hops around a 2-cycle = itself
    c("y") shouldBe (("y", 4L, 0L))
    // acyclic chain of 6 against cap 4: node reached after EXACTLY 4 hops
    val chain = (0 until 6).map(i => (s"n$i", s"n${i + 1}")).toDF("src", "dst")
    val r = Urls.resolveRedirects(chain, "src", "dst", maxHops = 4)
      .collect()
      .map(x => x.getString(0) -> ((x.getString(1), x.getLong(2), x.getLong(3))))
      .toMap
    r("n0") shouldBe (("n4", 4L, 0L))
    r("n3") shouldBe (("n6", 3L, 1L)) // resolves inside the cap
  }

  test("resolveRedirects collapses multi-valued sources to the min dst") {
    val m = Seq(("a", "z"), ("a", "b"), ("b", "c")).toDF("src", "dst")
    val out = Urls.resolveRedirects(m, "src", "dst", maxHops = 8)
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap
    out("a") shouldBe "c" // via the min edge a->b, not a->z
    an[IllegalArgumentException] should be thrownBy
      Urls.resolveRedirects(m, "src", "dst", maxHops = 6) // not a power of 2
  }

  test("fetchSlots balances each domain across slots within one url") {
    val urls = (1L to 103L).map(i =>
      (i, s"https://www.h${i % 3}.com/p$i")).toDF("id", "url")
    val got = Urls.fetchSlots(urls, "id", "url", slots = 4)
    got.count() shouldBe 103L
    // per (domain, slot) count within ceil/floor of n_domain/slots
    val bad = got.groupBy(col("domain"), col("slot")).count()
      .groupBy(col("domain"))
      .agg((max(col("count")) - min(col("count"))).as("spread"),
        countDistinct(col("slot")).as("ns"))
      .filter(col("spread") > 1 || col("ns") =!= 4)
      .count()
    bad shouldBe 0L
    // deterministic across partitionings
    val b = Urls.fetchSlots(urls.repartition(7), "id", "url", slots = 4)
      .collect().map(_.toString).sorted
    got.collect().map(_.toString).sorted shouldBe b
  }

  test("oovReport: hand-computed oov fractions per group") {
    val docs = Seq(
      ("en", "a a a b"), // a in vocab (3+1 uses), b rare
      ("de", "a b c c")).toDF("lang", "text")
    // vocab minCount=2 topV=2: counts a=4, b=2, c=2 -> top2 = a, b
    val got = Vocab.oovReport(docs, "text", "lang", minCount = 2L, topV = 2)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    got("en") shouldBe ((4L, 4L, 0L, 0L))
    // de: tokens a,b,c,c -> in vocab a,b = 2; oov 2 -> 500000 ppm
    got("de") shouldBe ((4L, 2L, 2L, 500000L))
  }
}
