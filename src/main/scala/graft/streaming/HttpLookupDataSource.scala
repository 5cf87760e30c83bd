package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.http.HttpConfigException

/** DSv2 LOOKUP table — the `CREATE TABLE … USING graft-http-lookup` surface
  * mirroring the reference's SQL-first lookup source
  * (`table/lookup/HttpLookupTableSourceFactory.java`: `CREATE TABLE … WITH
  * ('connector'='http')` + `JOIN … FOR SYSTEM_TIME AS OF`):
  *
  * {{{
  * CREATE TABLE api (id STRING, name STRING, balance DOUBLE)
  * USING `graft-http-lookup`
  * OPTIONS (url 'http://svc/user');
  *
  * SELECT p.event, a.name, a.balance
  * FROM probe p JOIN api a ON p.id = a.id;   -- planned as an HTTP lookup
  * }}}
  *
  * The declared columns are the lookup RESPONSE schema; the join's ON-clause
  * equi-columns become the lookup keys (exactly how Flink's planner derives
  * lookup keys from the join). Spark has no lookup-join operator, so the
  * rewrite lives in [[graft.plans.HttpLookupJoinRule]], an analyzer rule
  * injected by `spark.sql.extensions=graft.plans.GraftExtensions` that
  * replaces the Join with the same Catalyst pipeline the Scala API and the
  * `http_lookup` TVF build — codegen'd request rendering, narrow
  * mapPartitions I/O, format-resolved decode. Without the extensions config
  * the table resolves but any attempt to execute it lands in the
  * [[HttpLookupTable.newScanBuilder]] error below, which says what to do.
  */
class HttpLookupDataSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-http-lookup"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new HttpConfigException(
      "graft-http-lookup requires an explicit schema — the declared columns " +
        "are the lookup response schema: CREATE TABLE t (id STRING, …) " +
        "USING `graft-http-lookup` OPTIONS (url '…')")

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new HttpLookupTable(schema, properties.asScala.toMap)
}

/** Catalog entry for a lookup endpoint. Declares BATCH_READ so analysis
  * accepts it in a query, but it is not scannable — the join rule must
  * replace it before planning, so `newScanBuilder` (reached only when the
  * rule did not fire: extensions missing, or a bare scan with no join)
  * explains the contract instead of failing with a capability error.
  */
private[graft] class HttpLookupTable(
    schema0: StructType,
    val options: Map[String, String]) extends Table with SupportsRead {

  override def name(): String =
    s"graft-http-lookup(${options.getOrElse("url", "?")})"

  override def schema(): StructType = schema0

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    throw new HttpConfigException(
      "graft-http-lookup is a lookup table: it cannot be scanned, only " +
        "equi-joined on its key columns (probe JOIN api ON probe.k = api.k). " +
        "If you did join it, enable " +
        "spark.sql.extensions=graft.plans.GraftExtensions so the join is " +
        "planned as an HTTP lookup")
}
