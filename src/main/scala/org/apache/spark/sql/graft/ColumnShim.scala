package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge from raw Catalyst [[Expression]]s to the public [[Column]] API.
  * Spark 4 made Column expression-agnostic (ColumnNode), so building a
  * Column from a custom Expression goes through the `private[sql]` converter
  * — hence this one-file shim inside the `org.apache.spark.sql` namespace
  * (the standard extension-library technique).
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a Column's node tree to a CATALYST expression tree
    * (unresolved functions and lambdas as plain catalyst nodes the analyzer
    * can resolve). [[expression]] wraps the node lazily, which is right for
    * the DataFrame path but opaque to the function registry — a registered
    * builder must hand the analyzer a real catalyst tree.
    */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Wrap an analyzed [[LogicalPlan]] back into the DataFrame API (the
    * `Dataset.ofRows` seam, `private[sql]` since Spark 4) — lets planner
    * rules hand a rewritten subtree to high-level operators like
    * [[graft.http.HttpLookup.join]].
    */
  def dataFrame(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      plan)
}
