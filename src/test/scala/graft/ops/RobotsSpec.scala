package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Urls.dropDisallowed]]: prefix semantics, domain scoping. */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val urls = Seq(
    (1L, "https://www.a.com/admin/settings"),
    (2L, "https://www.a.com/administrator"), // prefix matches /admin too
    (3L, "https://www.a.com/public/admin"), // /admin not a PREFIX -> kept
    (4L, "https://www.b.com/admin/x"), // other domain -> kept
    (5L, "https://www.a.com/p5")).toDF("id", "url")
  private val rules = Seq(("a.com", "/admin")).toDF("d", "p")

  test("drops prefix-matching paths on the rule's domain only") {
    val kept = Urls.dropDisallowed(urls, "url", rules, "d", "p")
      .collect().map(_.getLong(0)).toSet
    kept shouldBe Set(3L, 4L, 5L)
  }

  test("empty rules are the identity") {
    Urls.dropDisallowed(
      urls, "url", rules.filter(col("d") === "nope"), "d", "p")
      .count() shouldBe 5L
  }
}
