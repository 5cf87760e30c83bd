package graft.ops

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val probe: DataFrame =
    ((1L to 200L).map(i => (i, s"p$i")) :+ (0L, "nullkey"))
      .toDF("k", "tag")
      .withColumn(
        "k",
        org.apache.spark.sql.functions
          .when($"tag" === "nullkey", null)
          .otherwise($"k"))

  private lazy val build: DataFrame =
    (1L to 200L by 3L).toDF("bk")

  test("antiJoin equals the plain left_anti join, nulls kept") {
    val got = BloomJoin
      .antiJoin(probe, "k", build, "bk")
      .collect()
      .map(r => (Option(r.get(0)), r.getString(1)))
      .toSet
    val want = probe
      .join(build, probe("k") === build("bk"), "left_anti")
      .collect()
      .map(r => (Option(r.get(0)), r.getString(1)))
      .toSet
    got shouldBe want
    // null-keyed row never equi-matches -> kept
    got.exists(_._2 == "nullkey") shouldBe true
  }

  test("semiJoin equals the plain left_semi join, nulls dropped") {
    val got = BloomJoin
      .semiJoin(probe, "k", build, "bk")
      .collect()
      .map(_.getString(1))
      .toSet
    val want = probe
      .join(build, probe("k") === build("bk"), "left_semi")
      .collect()
      .map(_.getString(1))
      .toSet
    got shouldBe want
    got.contains("nullkey") shouldBe false
  }

  test("string keys work (xxhash64 over any atomic type)") {
    val p = Seq("a", "b", "c", "d").toDF("s")
    val b = Seq("b", "d", "x").toDF("t")
    BloomJoin.antiJoin(p, "s", b, "t").collect().map(_.getString(0)).toSet shouldBe
      Set("a", "c")
    BloomJoin.semiJoin(p, "s", b, "t").collect().map(_.getString(0)).toSet shouldBe
      Set("b", "d")
  }

  test("empty build side: antiJoin is the identity, semiJoin is empty") {
    // BloomFilterAggregate over zero rows evaluates to SQL NULL; a naive
    // might-contain over a null blob would drop EVERY probe row.
    val emptyBuild = build.filter($"bk" < 0L)
    BloomJoin.antiJoin(probe, "k", emptyBuild, "bk").count() shouldBe
      probe.count()
    BloomJoin.semiJoin(probe, "k", emptyBuild, "bk").count() shouldBe 0L
    // all-null build keys are the same zero-key case
    val nullBuild = build.withColumn(
      "bk",
      org.apache.spark.sql.functions.lit(null).cast("long"))
    BloomJoin.antiJoin(probe, "k", nullBuild, "bk").count() shouldBe
      probe.count()
    BloomJoin.semiJoin(probe, "k", nullBuild, "bk").count() shouldBe 0L
  }

  test("build side above maxNumItems clamps to session conf and stays exact") {
    // default conf: maxNumItems = 4M; requesting more must not throw —
    // the filter degrades toward higher fpp, the exact join still decides.
    val got = BloomJoin
      .antiJoin(probe, "k", build, "bk", expectedItems = 100_000_000L)
      .count()
    got shouldBe probe.join(build, probe("k") === build("bk"), "left_anti").count()
  }

  test("explicit expectedItems skips the sizing count and stays exact") {
    val got = BloomJoin
      .antiJoin(probe, "k", build, "bk", expectedItems = 1000L, fpp = 0.5)
      .count()
    // even a tiny, high-fpp filter cannot change the result, only the
    // fraction of rows taking the exact-join detour
    got shouldBe probe.join(build, probe("k") === build("bk"), "left_anti").count()
  }
}
