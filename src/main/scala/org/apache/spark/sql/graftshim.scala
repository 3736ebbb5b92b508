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
}
