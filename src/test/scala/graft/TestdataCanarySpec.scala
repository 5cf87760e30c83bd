package graft

import java.io.File

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.queries.Tables

/** Driver-fixture canary — the r8 blind spot, closed.
  *
  * r8 shipped 286 green specs while seven driver gates failed analysis,
  * because no spec read the driver's actual `events.parquet` through the
  * shared reader (every streaming/session spec used MemoryStream or
  * synthetic frames). This spec loads EVERY driver table at sf0.001 through
  * the same helpers the gated queries use and runs a trivial aggregate, so
  * a runtime upgrade or a testdata regeneration that changes decoded schemas
  * fails `sbt test`, not just the driver's correctness run.
  */
class TestdataCanarySpec extends SparkSpec {

  private val dir =
    sys.env.getOrElse("SPARK_GRAFT_CANARY_DIR", "/root/testdata/sf0.001")

  private val plainTables = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "documents", "embeddings")

  test("every driver table loads and aggregates through the shared reader") {
    assume(new File(dir).isDirectory, s"driver testdata not present at $dir")
    for (t <- plainTables) {
      withClue(s"table $t: ") {
        Tables.table(spark, dir, t).count() should be > 0L
      }
    }
  }

  test("events loads through the ts-normalizing reader and windows by hour") {
    assume(new File(dir).isDirectory, s"driver testdata not present at $dir")
    val ev = Tables.events(spark, dir)
    // the normalized column must be a session-zone TIMESTAMP — the exact
    // contract every window/lag/as-of expression downstream relies on
    ev.schema("ts").dataType shouldBe TimestampType
    // the r8 failure shape: an hourly window over the decoded ts column
    val hourly = ev
      .groupBy(window(col("ts"), "1 hour").getField("start").as("h"))
      .agg(count(lit(1)).as("n"))
    hourly.count() should be > 0L
  }
}
