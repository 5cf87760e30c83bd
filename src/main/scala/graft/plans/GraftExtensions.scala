package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.graft.{DotProductF, Hash61F, NfcNormalizeF}

/** Session extensions: register graft's native expressions with the SQL
  * function registry so `spark.sql("SELECT graft_dot(a, b) ...")` and
  * `graft_hash61(s)` work, plus the `http_lookup` table-valued function
  * (the SQL surface for the HTTP lookup join — see [[HttpLookupTvf]]).
  *
  * Enable with `spark.sql.extensions=graft.plans.GraftExtensions`, or call
  * [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    GraftExtensions.tableFunctions.foreach(ext.injectTableFunction)
    // lookup-join planning for CREATE TABLE … USING graft-http-lookup —
    // post-resolution so the rewrite happens before capability checks and
    // physical planning (see HttpLookupJoinRule)
    ext.injectPostHocResolutionRule(sp => HttpLookupJoinRule(sp))
  }
}

object GraftExtensions {

  private type FunctionDef =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  /** Column-composition functions registered by wrapping the same
    * `graft.ops.TextFunctions` Column builders the DataFrame API uses —
    * one owner, so the SQL surface cannot drift from the Scala one. The
    * builders compose standard resolved children into standard Catalyst
    * expressions, which the analyzer then type-checks as usual.
    */
  private def columnFn(
      name: String,
      arity: Int,
      build: Seq[org.apache.spark.sql.Column] => org.apache.spark.sql.Column)
      : FunctionDef =
    (
      FunctionIdentifier(name),
      new ExpressionInfo("graft.ops.TextFunctions", name),
      (children: Seq[Expression]) => {
        require(children.size == arity, s"$name takes exactly $arity argument(s)")
        org.apache.spark.sql.graft.ColumnShim.catalystExpression(
          build(children.map(org.apache.spark.sql.graft.ColumnShim.column)))
      })

  private[plans] val functions: Seq[FunctionDef] = Seq(
    (
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductF].getCanonicalName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_dot takes exactly 2 arguments")
        DotProductF(children.head, children(1))
      }),
    (
      FunctionIdentifier("graft_hash61"),
      new ExpressionInfo(classOf[Hash61F].getCanonicalName, "graft_hash61"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_hash61 takes exactly 1 argument")
        Hash61F(children.head)
      }),
    // text-pipeline surface: the P8/P9/P14/P50 operators for SQL users
    columnFn("graft_lang_id", 1,
      cs => graft.ops.TextFunctions.langId(cs.head)),
    columnFn("graft_token_count", 1,
      cs => graft.ops.TextFunctions.tokenCount(cs.head)),
    columnFn("graft_quality_score", 1,
      cs => graft.ops.TextFunctions.qualityScore(cs.head)),
    columnFn("graft_clean_text", 1,
      cs => graft.ops.TextFunctions.cleanText(cs.head)),
    columnFn("graft_normalize_answer", 1,
      cs => graft.ops.TextFunctions.normalizeAnswer(cs.head)),
    (
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalizeF].getCanonicalName, "graft_nfc"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_nfc takes exactly 1 argument")
        NfcNormalizeF(children.head)
      }))

  private type TableFunctionDef =
    (
        FunctionIdentifier,
        ExpressionInfo,
        Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)

  private[plans] val tableFunctions: Seq[TableFunctionDef] = Seq(
    (
      FunctionIdentifier(HttpLookupTvf.Name),
      new ExpressionInfo(HttpLookupTvf.getClass.getCanonicalName, HttpLookupTvf.Name),
      (args: Seq[Expression]) => HttpLookupTvf.build(args)),
    (
      FunctionIdentifier(RangeJoinTvf.Name),
      new ExpressionInfo(RangeJoinTvf.getClass.getCanonicalName, RangeJoinTvf.Name),
      (args: Seq[Expression]) => RangeJoinTvf.build(args)))

  /** Imperative registration for sessions created without the extensions
    * config. Covers functions and the TVF only — analyzer rules (the
    * `graft-http-lookup` join planning) cannot be added to a live session;
    * they need `spark.sql.extensions=graft.plans.GraftExtensions` at
    * session build.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
    tableFunctions.foreach { case (ident, info, builder) =>
      spark.sessionState.tableFunctionRegistry
        .registerFunction(ident, info, builder)
    }
  }
}
