package graft.ops

import graft.SparkSpec

/** [[Sampling.mixturePlan]]: hand-computed plans, caps, zero-token groups,
  * and the planned-vs-desired audit invariant.
  */
class MixturePlanSpec extends SparkSpec {
  import spark.implicits._

  private def plan(
      rows: Seq[(String, Long)],
      targets: Map[String, Int],
      default: Int,
      budget: Long,
      max: Int = 1000): Map[String, (Long, Long, Long)] =
    Sampling
      .mixturePlan(
        rows.toDF("lang", "n_tokens"),
        "lang",
        "n_tokens",
        targets,
        default,
        budget,
        max)
      .collect()
      .map(r =>
        r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  test("hand-computed rates: downsample over-represented, cap upsampling") {
    // budget 1000; en: share 500‰ -> desired 500 of 2000 -> 250‰
    // zh: share 400‰ -> desired 400 of 100 -> 4000‰ capped at 2000‰
    // de: default 100‰ -> desired 100 of 1000 -> 100‰
    val got = plan(
      Seq(("en", 2000L), ("zh", 100L), ("de", 1000L)),
      Map("en" -> 500, "zh" -> 400),
      default = 100,
      budget = 1000L,
      max = 2000)
    got("en") shouldBe ((500L, 250L, 500L))
    got("zh") shouldBe ((400L, 2000L, 200L))
    got("de") shouldBe ((100L, 100L, 100L))
  }

  test("zero-token groups get rate zero") {
    val got = plan(Seq(("xx", 0L)), Map.empty, 500, 1000L)
    got("xx") shouldBe ((500L, 0L, 0L))
  }

  test("planned tokens never exceed the group's desired share") {
    val got = plan(
      Seq(("a", 777L), ("b", 13L), ("c", 999999L)),
      Map("a" -> 333, "b" -> 333),
      default = 334,
      budget = 12345L,
      max = 5000)
    for ((lang, (share, _, planned)) <- got)
      withClue(s"$lang: ") {
        planned should be <= (12345L * share) / 1000L
      }
  }

  test("floor math is exact past double precision") {
    // budget * share = 9.2e18-ish territory must not round through double
    val big = 9_000_000_000_000_000L // 9e15 tokens
    val got = plan(
      Seq(("en", big)),
      Map("en" -> 1000),
      default = 0,
      budget = big,
      max = 1000)
    got("en") shouldBe ((1000L, 1000L, big))
  }

  test("64-bit overflow is a loud error, not a wrapped plan") {
    // budget·maxShare past Long.Max → driver-side require fires
    an[IllegalArgumentException] should be thrownBy
      plan(Seq(("en", 1L)), Map("en" -> 1000), 100, Long.MaxValue / 999)
    // the cap itself is legal: the scaladoc's 9.2-quadrillion-token case
    noException should be thrownBy
      plan(Seq(("en", 1L)), Map("en" -> 1000), 100, Long.MaxValue / 1000)
    // data-dependent: a token count whose tokens·rate would wrap raises
    // in-plan instead of producing a wrong planned_tokens
    a[Throwable] should be thrownBy
      plan(Seq(("en", Long.MaxValue / 10)), Map("en" -> 1000), 100, 1000L)
  }

  test("negative inputs are rejected") {
    an[IllegalArgumentException] should be thrownBy
      Sampling.mixturePlan(
        Seq(("en", 1L)).toDF("lang", "n_tokens"),
        "lang", "n_tokens", Map.empty, -1, 10L)
    an[IllegalArgumentException] should be thrownBy
      Sampling.mixturePlan(
        Seq(("en", 1L)).toDF("lang", "n_tokens"),
        "lang", "n_tokens", Map.empty, 1, -10L)
  }
}
