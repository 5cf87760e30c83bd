package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

import graft.ops.RangeJoin

/** SQL table-valued-function surface for the bucketized range join: SQL
  * users writing a raw `p BETWEEN lo AND hi` join get Spark's cartesian
  * BroadcastNestedLoopJoin plan (the 100 TB scale killer RangeJoin
  * exists to avoid), so the TVF exposes the rewritten equi-join plan to
  * SQL directly:
  *
  * {{{
  * SELECT * FROM range_join(
  *   'points_view', 'p',            -- points table + LONG point column
  *   'intervals_view', 'lo', 'hi',  -- intervals table + LONG range cols
  *   3600000000)                    -- bucket width (LONG literal)
  * }}}
  *
  * The returned plan is exactly [[RangeJoin.pointInInterval]]'s Catalyst
  * pipeline (map-side interval replication, equi-join on the bucket,
  * exact residual) spliced in as the TVF result — the `http_lookup`
  * pattern (`HttpLookupTvf`).
  */
object RangeJoinTvf {

  val Name = "range_join"

  def build(args: Seq[Expression]): LogicalPlan = {
    def lit(e: Expression, what: String): Any = {
      if (!e.foldable)
        throw new IllegalArgumentException(s"$Name: $what must be a literal")
      val v = e.eval()
      if (v == null)
        throw new IllegalArgumentException(s"$Name: $what must not be null")
      v
    }
    def str(e: Expression, what: String): String = {
      if (e.dataType != StringType)
        throw new IllegalArgumentException(
          s"$Name: $what must be a string literal")
      lit(e, what).toString
    }
    if (args.length != 6)
      throw new IllegalArgumentException(
        s"$Name takes (pointsTable, pointCol, intervalsTable, loCol, " +
          "hiCol, bucketWidth)")
    val bucket = args(5).dataType match {
      case LongType | IntegerType =>
        lit(args(5), "bucket width").toString.toLong
      case StringType => str(args(5), "bucket width").toLong
      case other =>
        throw new IllegalArgumentException(
          s"$Name: bucket width must be an integer literal (got $other)")
    }
    val spark = SparkSession.active
    RangeJoin
      .pointInInterval(
        spark.table(str(args.head, "points table")),
        str(args(1), "point column"),
        spark.table(str(args(2), "intervals table")),
        str(args(3), "lo column"),
        str(args(4), "hi column"),
        bucket)
      .queryExecution
      .analyzed
  }
}
