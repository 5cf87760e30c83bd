package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val quotes = Seq(
    ("A", ts("2024-01-01 09:00:00"), 10.0),
    ("A", ts("2024-01-01 09:05:00"), 11.0),
    ("A", ts("2024-01-01 09:30:00"), 12.0),
    ("B", ts("2024-01-01 09:10:00"), 100.0))
    .toDF("sym", "qts", "px")

  private val trades = Seq(
    (1L, "A", ts("2024-01-01 09:04:59")), // -> 10.0
    (2L, "A", ts("2024-01-01 09:05:00")), // inclusive -> 11.0
    (3L, "A", ts("2024-01-01 10:00:00")), // -> 12.0
    (4L, "B", ts("2024-01-01 09:00:00")), // before any quote -> null
    (5L, "C", ts("2024-01-01 09:00:00"))) // no quotes at all -> null
    .toDF("trade_id", "sym", "tts")

  test("leftAsOf picks the latest right row at-or-before each left time") {
    val out = AsOfJoin
      .leftAsOf(
        trades,
        "tts",
        quotes,
        "qts",
        keys = Seq(("sym", "sym")),
        payload = Seq("px"))
      .orderBy("trade_id")
      .collect()
    out.map(r =>
      (r.getAs[Long]("trade_id"), Option(r.get(r.fieldIndex("px"))))).toSeq shouldBe
      Seq(
        (1L, Some(10.0)),
        (2L, Some(11.0)),
        (3L, Some(12.0)),
        (4L, None),
        (5L, None))
  }

  test("left columns are preserved untouched") {
    val out = AsOfJoin
      .leftAsOf(trades, "tts", quotes, "qts", Seq(("sym", "sym")), Seq("px"))
    out.columns.toSeq shouldBe Seq("trade_id", "sym", "tts", "px")
    out.count() shouldBe 5
  }

  test("null payload in the matched right row stays null (no stale backfill)") {
    // Regression: per-column last(c, ignoreNulls) windows replaced a null in
    // the MATCHED row with a value from an older row; the struct fill must
    // attach the latest right row as a unit, nulls included.
    val q = Seq(
      ("A", ts("2024-01-01 09:00:00"), Option(10.0), Option("x")),
      ("A", ts("2024-01-01 09:05:00"), Option.empty[Double], Option("y")))
      .toDF("sym", "qts", "px", "src")
    val t = Seq((1L, "A", ts("2024-01-01 09:10:00")))
      .toDF("trade_id", "sym", "tts")
    val out = AsOfJoin
      .leftAsOf(t, "tts", q, "qts", Seq(("sym", "sym")), Seq("px", "src"))
      .collect()
    out should have size 1
    // matched row is the 09:05 quote: px is null THERE, so it is null HERE —
    // and both payload columns come from that same row
    out.head.isNullAt(out.head.fieldIndex("px")) shouldBe true
    out.head.getAs[String]("src") shouldBe "y"
  }

  test("tieBreak resolves equal right timestamps deterministically") {
    val dupQuotes = Seq(
      ("A", ts("2024-01-01 09:00:00"), 1.0, 1L),
      ("A", ts("2024-01-01 09:00:00"), 2.0, 2L))
      .toDF("sym", "qts", "px", "qid")
    val out = AsOfJoin
      .leftAsOf(
        trades.filter($"trade_id" === 1L),
        "tts",
        dupQuotes,
        "qts",
        Seq(("sym", "sym")),
        Seq("px"),
        tieBreak = Some("qid"))
      .collect()
    // highest tie-break sorts last -> wins the carry-forward
    out.head.getAs[Double]("px") shouldBe 2.0
  }
}
