package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column⇄Expression conversions of Spark 4
  * (the Connect refactor removed the public `new Column(expr)` path). This
  * is the supported classic-mode conversion, just re-exported for the graft
  * expression library.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
