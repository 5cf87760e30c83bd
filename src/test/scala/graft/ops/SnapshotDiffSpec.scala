package graft.ops

import graft.SparkSpec

/** [[Dedup.snapshotDiff]]: the four statuses, hand-computed. */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("classifies added / removed / changed / unchanged") {
    val oldDf = Seq(
      (1L, "same"), (2L, "will change"), (3L, "will vanish")).toDF("id", "text")
    val newDf = Seq(
      (1L, "same"), (2L, "changed!"), (4L, "brand new")).toDF("id", "text")
    val got = Dedup.snapshotDiff(oldDf, newDf, "id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.isNullAt(2), r.isNullAt(3))))
      .toMap
    got(1L) shouldBe (("unchanged", false, false))
    got(2L) shouldBe (("changed", false, false))
    got(3L) shouldBe (("removed", false, true))
    got(4L) shouldBe (("added", true, false))
    got.size shouldBe 4
  }

  test("identical snapshots diff to all-unchanged") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    Dedup.snapshotDiff(df, df, "id", "text")
      .collect().map(_.getString(1)).toSet shouldBe Set("unchanged")
  }
}
