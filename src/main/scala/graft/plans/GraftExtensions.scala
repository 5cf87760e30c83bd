package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.graft.DotProductF

/** Session extensions: register graft's native expressions with the SQL
  * function registry so `spark.sql("SELECT graft_dot(a, b) ...")` works.
  *
  * Enable with `spark.sql.extensions=graft.plans.GraftExtensions`, or call
  * [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotFunction)
  }
}

object GraftExtensions {

  private[plans] val dotFunction
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(
      classOf[DotProductF].getCanonicalName,
      "graft_dot"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_dot takes exactly 2 arguments")
      DotProductF(children.head, children(1))
    })

  /** Imperative registration for sessions created without the extensions
    * config.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (ident, info, builder) = dotFunction
    spark.sessionState.functionRegistry
      .registerFunction(ident, info, builder)
  }
}
