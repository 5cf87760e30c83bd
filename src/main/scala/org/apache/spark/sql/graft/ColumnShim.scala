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
}
