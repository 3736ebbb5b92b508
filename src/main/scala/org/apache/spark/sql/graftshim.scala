package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `Column.expr` / `new Column(expr)` bridge; the
  * replacement (`classic.ExpressionUtils`) is private[sql]. This shim is the
  * single sanctioned crossing point for graft's custom Catalyst expressions.
  */
object graftshim {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function builder into an EXISTING session's registry
    * (`sessionState` is private[sql]) — the runtime twin of
    * [[graft.GraftExtensions]], for sessions created without
    * `spark.sql.extensions` (tests, notebooks).
    */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
