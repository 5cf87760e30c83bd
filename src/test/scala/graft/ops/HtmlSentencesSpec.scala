package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TextFunctions.stripHtml]] and [[TextFunctions.sentences]]. */
class HtmlSentencesSpec extends SparkSpec {
  import spark.implicits._

  private def strip(s: String): String =
    Seq(s).toDF("t").select(TextFunctions.stripHtml(col("t")))
      .collect()(0).getString(0)

  private def sents(s: String): Seq[String] =
    Seq(s).toDF("t").select(TextFunctions.sentences(col("t")))
      .collect()(0).getSeq[String](0)

  test("drops script/style WITH content, strips tags, decodes entities") {
    strip("<p>Hello <b>world</b></p>") shouldBe "Hello world"
    strip("<script>var x = 1 < 2;</script>after") shouldBe "after"
    strip("<style>a { b: c }</style>text") shouldBe "text"
    strip("a &lt;b&gt; &quot;c&quot; &#39;d&#39;&nbsp;e &amp; f") shouldBe
      "a <b> \"c\" 'd' e & f"
    // double-escape rule: &amp;lt; is the LITERAL string "&lt;"
    strip("x &amp;lt; y") shouldBe "x &lt; y"
    strip("<div\nclass='a'>multi\nline</div>") shouldBe "multi line"
  }

  test("sentences split after terminal punct, keep unpunctuated tail") {
    sents("One. Two! Three? tail") shouldBe Seq("One.", "Two!", "Three?", "tail")
    sents("He said \"Stop.\" Then left.") shouldBe
      Seq("He said \"Stop.\"", "Then left.")
    sents("No terminal punct at all") shouldBe Seq("No terminal punct at all")
    sents("") shouldBe Seq.empty
    // internal periods without following space do NOT split
    sents("Version 2.5 works. Done.") shouldBe Seq("Version 2.5 works.", "Done.")
  }
}
