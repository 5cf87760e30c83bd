package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val t = Seq(
    (1L, Some(10.0), "a"),
    (2L, Some(-3.0), "b"),
    (3L, None, "a"),
    (3L, Some(5.0), "zz"))
    .toDF("id", "price", "status")

  test("predicateReport counts all violations in one pass; null = violation") {
    val rep = DataQuality.predicateReport(t, Seq(
      "price_positive" -> (col("price") > 0.0),
      "status_short" ->
        (org.apache.spark.sql.functions.length(col("status")) === 1)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    // price: -3 fails, null fails (unknown is not a pass) -> 2
    rep("price_positive") shouldBe ((2L, 4L, 0))
    rep("status_short") shouldBe ((1L, 4L, 0))
  }

  test("uniqueReport counts every member of a duplicated key") {
    val rep = DataQuality.uniqueReport(t, Seq("id"), "id_unique").collect().head
    rep.getAs[Long]("n_violations") shouldBe 2L // both id=3 rows
    rep.getAs[Long]("n_rows") shouldBe 4L
    rep.getAs[Int]("pass") shouldBe 0
  }

  test("fkReport counts orphans; clean FK passes") {
    val parent = Seq(1L, 2L).toDF("pid")
    val rep = DataQuality.fkReport(t, "id", parent, "pid", "fk").collect().head
    rep.getAs[Long]("n_violations") shouldBe 2L // the two id=3 rows
    val full = Seq(1L, 2L, 3L).toDF("pid")
    DataQuality.fkReport(t, "id", full, "pid", "fk")
      .collect().head.getAs[Int]("pass") shouldBe 1
  }

  test("check names with dots, backticks and duplicates are just labels") {
    val rep = DataQuality.predicateReport(t, Seq(
      "price.is.positive" -> (col("price") > 0.0),
      "weird`name" -> col("id").isNotNull,
      "weird`name" -> col("id").isNull)) // duplicate name, distinct check
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(3)))
    rep should contain(("price.is.positive", 2L, 0))
    rep.count(_._1 == "weird`name") shouldBe 2
    rep should contain(("weird`name", 0L, 1))
    rep should contain(("weird`name", 4L, 0))
  }

  test("empty input reports zero violations and passes") {
    val empty = t.filter(col("id") < 0L)
    val rows = DataQuality.combine(
      DataQuality.predicateReport(empty, Seq("p" -> (col("price") > 0.0))),
      DataQuality.uniqueReport(empty, Seq("id"), "u"),
      DataQuality.fkReport(empty, "id", t, "id", "fk"))
      .collect()
    rows should have size 3
    rows.foreach { r =>
      r.getAs[Long]("n_violations") shouldBe 0L
      r.getAs[Long]("n_rows") shouldBe 0L
      r.getAs[Int]("pass") shouldBe 1
    }
  }

  test("combine unions reports with the stable column order") {
    val rep = DataQuality.combine(
      DataQuality.predicateReport(t, Seq("p" -> (col("price") > 0.0))),
      DataQuality.uniqueReport(t, Seq("id"), "u"))
    rep.columns.toSeq shouldBe Seq("check_name", "n_violations", "n_rows", "pass")
    rep.count() shouldBe 2L
  }
}

class ConfusablesSpec extends SparkSpec {
  import spark.implicits._

  test("skeleton folds Cyrillic/Greek homoglyphs and fullwidth forms") {
    // "\u0440\u0430\u0443\u0441\u0435" spelled with Cyrillic lookalikes + fullwidth "\uFF38\uFF19"
    val df = Seq(
      ("\u0440\u0430y\u0441\u0435 \uFF38\uFF19", "payce X9"))
      .toDF("obf", "plain")
    val out = df.select(
      TextFunctions.confusableSkeleton(col("obf")).as("s1"),
      TextFunctions.confusableSkeleton(col("plain")).as("s2"))
      .collect().head
    out.getString(0) shouldBe out.getString(1)
    out.getString(0) shouldBe "payce X9"
  }

  test("zero-width characters are deleted, not mapped") {
    val df = Seq(("a\u200Bb\u200Cc\u200Dd\u2060e\uFEFFf", "abcdef"))
      .toDF("obf", "plain")
    val out = df.select(
      TextFunctions.confusableSkeleton(col("obf")).as("s")).collect().head
    out.getString(0) shouldBe "abcdef"
  }

  test("an obfuscated duplicate hashes apart raw but together by skeleton") {
    val orig = "the quick brown fox"
    val obf = orig
      .replace('o', '\u043E') // Cyrillic \u043E
      .replace('e', '\u0435') + "\u200B"
    val df = Seq((1L, orig), (2L, obf)).toDF("id", "text")
    val fps = df.select(
      TextFunctions.hashMod(col("text")).as("raw"),
      TextFunctions.hashMod(
        TextFunctions.confusableSkeleton(col("text"))).as("skel"))
      .collect()
    fps(0).getLong(0) should not be fps(1).getLong(0)
    fps(0).getLong(1) shouldBe fps(1).getLong(1)
  }

  test("plain ASCII text is a fixed point of the skeleton") {
    val s = "Plain ASCII stays 100% unchanged!"
    Seq(Tuple1(s)).toDF("t")
      .select(TextFunctions.confusableSkeleton(col("t")))
      .collect().head.getString(0) shouldBe s
  }
}
