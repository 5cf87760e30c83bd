package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.GateTemp

/** Byte-fidelity contract of [[Formats.roundTrip]] for each supported
  * interchange format, on content chosen to break naive writers: embedded
  * quotes, commas, newlines (CRLF too), backslashes, leading/trailing
  * whitespace, unicode (escaped per repo convention), and a value equal to
  * the CSV quote character alone.
  */
class FormatsSpec extends SparkSpec {

  private def adversarialRows: Seq[(Long, String, Long)] = Seq(
    (1L, "plain ascii", 11L),
    (2L, "comma, inside", 13L),
    (3L, "a \"quoted\" word", 15L),
    (4L, "line one\nline two", 17L),
    (5L, "crlf\r\nsecond", 12L),
    (6L, "back\\slash and trailing space ", 30L),
    (7L, " leading space", 14L),
    (8L, "unicode \u00e9\u4e16\u754c mixed", 17L),
    (9L, "\"", 1L),
    (10L, "quote-comma-nl \",\n mix \\\"", 25L))

  private def roundTripKeeps(format: String): Unit = {
    import spark.implicits._
    val df = adversarialRows.toDF("id", "text", "n")
    val dir = GateTemp.dir(s"graft-formats-spec-$format").toString + "/rt"
    val back = Formats.roundTrip(df, format, dir)
    val got = back.sort("id").as[(Long, String, Long)].collect().toSeq
    got shouldBe adversarialRows
  }

  test("orc round-trip is byte-faithful on adversarial text") {
    roundTripKeeps("orc")
  }

  test("json round-trip is byte-faithful on adversarial text") {
    roundTripKeeps("json")
  }

  test("csv round-trip is byte-faithful on adversarial text") {
    roundTripKeeps("csv")
  }

  test("csv cannot hold null/empty strings — documented caveat holds") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, Some("")))
      .toDF("id", "text")
    val dir = GateTemp.dir("graft-formats-spec-null").toString + "/rt"
    val back = Formats.roundTrip(df, "csv", dir).sort("id")
    // both degenerate values come back null — the reason the scaladoc
    // sends nullable text to ORC/JSON; pin it so a silent option change
    // that ALTERS the degradation (e.g. null -> "") is caught
    back.collect().map(_.isNullAt(1)).toSeq shouldBe Seq(true, true)
  }

  test("unsupported format is rejected loudly") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "text")
    val e = intercept[IllegalArgumentException] {
      Formats.roundTrip(df, "avro", "/tmp/never-written")
    }
    e.getMessage should include("unsupported round-trip format")
  }

  test("gate fingerprints: read-back aggregates match the source frame") {
    import spark.implicits._
    val df = adversarialRows.toDF("doc_id", "text", "n_chars")
      .withColumn("lang", concat(lit("l"), col("doc_id") % 2))
    val expected = df
      .groupBy("lang")
      .agg(
        sum(TextFunctions.hashMod(col("text"))).as("fp"),
        count(lit(1)).as("n"))
      .sort("lang")
      .collect()
      .toSeq
    Formats.supported.foreach { f =>
      val dir = GateTemp.dir(s"graft-formats-spec-agg-$f").toString + "/rt"
      val back = Formats.roundTrip(df, f, dir)
      val got = back
        .groupBy("lang")
        .agg(
          sum(TextFunctions.hashMod(col("text"))).as("fp"),
          count(lit(1)).as("n"))
        .sort("lang")
        .collect()
        .toSeq
      withClue(s"format=$f: ") { got shouldBe expected }
    }
  }

  test("graft.syntax exposes the r13 ops") {
    import graft.syntax._
    import spark.implicits._
    val df = Seq((1L, "hello world")).toDF("id", "text")
    val dir = GateTemp.dir("graft-syntax-rt").toString + "/rt"
    df.formatRoundTrip("json", dir).count() shouldBe 1L
    df.lshBandKeys("id", "text", n = 1).columns.toSeq shouldBe
      Seq("id", "band", "band_key")
    df.lshRegistry("id", "text", n = 1).columns.toSeq shouldBe
      Seq("band", "band_key", "min_id", "n_docs")
    val sig = Seq(Tuple1(Seq.fill(32)(1f))).toDF("v")
      .select($"v".signPacked(32).as("s"))
    sig.select($"s".hammingTo($"s")).head().getLong(0) shouldBe 0L
  }
}
