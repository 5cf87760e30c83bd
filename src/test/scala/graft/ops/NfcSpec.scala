package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TextFunctions.nfcNormalize]] (native NfcNormalizeF): composition,
  * idempotence, nulls, and agreement with the JDK reference. Unicode is
  * spelled in \\u escapes throughout — a source-encoding round-trip must
  * not silently change which form a literal is in.
  */
class NfcSpec extends SparkSpec {
  import spark.implicits._

  private val composed = "\u00e9cole" // é as one code point
  private val decomposed = "e\u0301cole" // e + combining acute

  private def norm(s: String): String =
    Seq(s).toDF("t")
      .select(TextFunctions.nfcNormalize(col("t")))
      .collect()(0).getString(0)

  test("composes decomposed sequences to canonical form") {
    decomposed.length shouldBe composed.length + 1
    norm(decomposed) shouldBe composed
    norm("e\u0301").length shouldBe 1
  }

  test("already-NFC text passes through unchanged (fast path)") {
    norm("plain ascii text") shouldBe "plain ascii text"
    norm(composed) shouldBe composed
  }

  test("idempotent and agrees with the JDK reference on mixed input") {
    val mixed = "A\u030avoir e\u0301te\u0301 l\u00e0 \u0153\u00c6 \ufb01 \ud55c"
    val once = norm(mixed)
    norm(once) shouldBe once
    once shouldBe java.text.Normalizer
      .normalize(mixed, java.text.Normalizer.Form.NFC)
  }

  test("null propagates; canonicalizeText also strips controls") {
    val rows = Seq((1L, null: String), (2L, "a\u0301   b\tc"))
      .toDF("id", "t")
      .select(col("id"), TextFunctions.canonicalizeText(col("t")).as("c"))
      .collect()
    rows(0).isNullAt(1) shouldBe true
    rows(1).getString(1) shouldBe "\u00e1 b c"
  }
}
