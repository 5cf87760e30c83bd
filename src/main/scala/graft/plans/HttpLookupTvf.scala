package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{StringType, StructType}

import graft.http.{HttpConfigException, HttpLookup}

/** SQL table-valued-function surface for the HTTP lookup join — the
  * `spark.sql` analog of the reference's SQL-first lookup table
  * (`table/lookup/HttpLookupTableSourceFactory.java`: `CREATE TABLE …
  * WITH ('connector'='http', …)` + `FOR SYSTEM_TIME AS OF` join). Spark has
  * no lookup-join planner node, so the surface is a TVF producing the
  * already-joined relation:
  *
  * {{{
  * SELECT * FROM http_lookup(
  *   'probe_view',                      -- table/view to enrich
  *   'id',                              -- comma-separated key columns
  *   'name STRING, balance DOUBLE',     -- response schema (DDL)
  *   'url', 'http://api/user',          -- option key/value pairs …
  *   'format', 'csv')
  * }}}
  *
  * All arguments must be string literals (they configure the plan, exactly
  * like the reference's DDL options). The returned plan is the same
  * Catalyst pipeline the Scala API builds — codegen'd request rendering, a
  * narrow mapPartitions for I/O, format-resolved decode.
  */
object HttpLookupTvf {

  val Name = "http_lookup"

  def build(args: Seq[Expression]): LogicalPlan = {
    def str(e: Expression, what: String): String = {
      if (!e.foldable || e.dataType != StringType)
        throw new HttpConfigException(
          s"$Name: $what must be a string literal")
      val v = e.eval()
      if (v == null)
        throw new HttpConfigException(s"$Name: $what must not be null")
      v.toString
    }
    if (args.length < 3 || (args.length - 3) % 2 != 0)
      throw new HttpConfigException(
        s"$Name takes (probeTable, keyCols, responseSchemaDdl, " +
          "optKey1, optValue1, ...)")
    val probeName = str(args.head, "probe table name")
    val keys = str(args(1), "key columns")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    if (keys.isEmpty)
      throw new HttpConfigException(s"$Name: key columns must not be empty")
    val schema = StructType.fromDDL(str(args(2), "response schema DDL"))
    val options = args.drop(3).grouped(2).map { pair =>
      str(pair.head, "option key") -> str(pair(1), "option value")
    }.toMap

    // Resolved on the driver during analysis: build the lookup DataFrame
    // with the Scala API and splice its analyzed plan in as the TVF result.
    val spark = SparkSession.active
    val probe = spark.table(probeName)
    HttpLookup.join(probe, keys, schema, options).queryExecution.analyzed
  }
}
