package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.types.StructType

class JsonIngestSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType.fromDDL("id long, lang string, nc long")

  private def parse(lines: Seq[(Long, String)]) =
    JsonIngest
      .parseJsonl(lines.toDF("row_id", "json"), "json", schema)
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          r.getBoolean(4), Option(r.get(5)))))
      .toMap

  test("good lines decode; malformed lines quarantine with raw payload") {
    val out = parse(Seq(
      1L -> """{"id":1,"lang":"en","nc":12}""",
      2L -> """{"id":2,"lang":"de","nc""",  // truncated mid-key
      3L -> """not json at all"""))
    out(1L) shouldBe ((Some(1L), Some("en"), Some(12L), false, None))
    out(2L) shouldBe
      ((None, None, None, true, Some("""{"id":2,"lang":"de","nc""")))
    out(3L) shouldBe ((None, None, None, true, Some("not json at all")))
  }

  test("malformed => ALL-null fields regardless of enablePartialResults") {
    // a truncated line whose LEADING fields are parseable: with
    // spark.sql.json.enablePartialResults=true (the default on newer
    // Sparks) a raw from_json would keep id/lang AND set _corrupt_record —
    // parseJsonl pins the all-null contract IN THE PLAN, so the
    // quarantine semantics (and the t_jsonl_ingest oracle) cannot drift
    // with runtime version or conf
    val conf = "spark.sql.json.enablePartialResults"
    val old = spark.conf.getOption(conf)
    try {
      for (v <- Seq("true", "false")) {
        spark.conf.set(conf, v)
        val out = parse(Seq(
          1L -> """{"id": 7, "lang": "en", "nc": """)) // cut mid-value
        withClue(s"$conf=$v: ") {
          out(1L) shouldBe ((None, None, None, true,
            Some("""{"id": 7, "lang": "en", "nc": """)))
        }
      }
    } finally old match {
      case Some(v) => spark.conf.set(conf, v)
      case None => spark.conf.unset(conf)
    }
  }

  test("schema drift is NOT corruption: valid JSON with missing fields") {
    val out = parse(Seq(
      1L -> """{}""",
      2L -> """{"unrelated":true}""",
      3L -> """{"id":3}"""))
    out(1L) shouldBe ((None, None, None, false, None))
    out(2L) shouldBe ((None, None, None, false, None))
    out(3L) shouldBe ((Some(3L), None, None, false, None))
  }

  test("parseAndQuarantine routes rows and strips the right columns") {
    val (good, bad) = JsonIngest.parseAndQuarantine(
      Seq(
        1L -> """{"id":1,"lang":"en","nc":5}""",
        2L -> """{"broken""").toDF("row_id", "json"),
      "json",
      schema)
    good.columns.toSeq shouldBe Seq("row_id", "id", "lang", "nc")
    bad.columns.toSeq shouldBe Seq("row_id", "raw")
    good.collect().map(_.getLong(0)).toSeq shouldBe Seq(1L)
    bad.collect().map(r => (r.getLong(0), r.getString(1))).toSeq shouldBe
      Seq((2L, """{"broken"""))
  }

  test("a schema declaring _corrupt_record is rejected") {
    an[IllegalArgumentException] should be thrownBy
      JsonIngest.parseJsonl(
        Seq(1L -> "{}").toDF("row_id", "json"),
        "json",
        StructType.fromDDL("id long, _corrupt_record string"))
  }
}
