package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(expr)/Column.expr bridge (Column now
  * wraps a ColumnNode for Connect compatibility). Classic-mode conversions
  * live in private[sql] ExpressionUtils — this package-qualified shim is
  * the one sanctioned escape hatch for libraries defining custom Catalyst
  * expressions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
