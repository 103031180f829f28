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

/** Bridge to `private[sql]` Dataset plan accessors for libraries that
  * build custom logical plans.
  */
object DatasetBridge {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.{DataFrame, SparkSession}

  def plan(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
