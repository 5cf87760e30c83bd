package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TextFunctions.codeSymbolPpm]]/[[TextFunctions.isCode]] routing. */
class CodeDetectSpec extends SparkSpec {
  import spark.implicits._

  private def row(s: String) =
    Seq(s).toDF("t")
      .select(
        TextFunctions.codeSymbolPpm(col("t")),
        TextFunctions.codeIndentPpm(col("t")),
        TextFunctions.codeKeywordHits(col("t")),
        TextFunctions.isCode(col("t")))
      .collect()(0)

  test("prose scores low and routes to prose") {
    val r = row("The quick brown fox jumps over the lazy dog near the river bank today")
    r.getLong(0) shouldBe 0L
    r.getBoolean(3) shouldBe false
  }

  test("code scores high on symbols, indentation and keywords") {
    val code =
      "def add(x, y):\n  z = (x + y);\n  if z { return z[0]; }\n  import os"
    val r = row(code)
    r.getLong(0) should be >= 60000L
    r.getLong(1) should be >= 300000L // 3 of 4 lines indented
    r.getLong(2) should be >= 3L // def, if, return, import
    r.getBoolean(3) shouldBe true
  }

  test("keyword hits are token-exact, not substring") {
    // "deft" and "classy" must not count
    row("deft classy returning imported").getLong(2) shouldBe 0L
  }

  test("empty text is zero everywhere") {
    val r = row("")
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)) shouldBe
      ((0L, 0L, 0L, false))
  }
}
