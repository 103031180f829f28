package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ⇄ Expression converters — the
  * standard technique for libraries that ship custom Catalyst
  * expressions (Spark 4 moved `Column.apply(Expression)` behind the
  * ColumnNode API; `classic.ExpressionUtils` is the supported classic
  * backend path).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
