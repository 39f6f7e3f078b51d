package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression and LogicalPlan -> DataFrame bridges. Spark 4
  * made the classic conversion helpers `private[sql]`; extension
  * libraries reach them from an `org.apache.spark.sql` subpackage (the
  * usual pattern for third-party Catalyst expressions/operators — no
  * internals are modified, only re-exported).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  /** Wrap a (resolved) logical plan as a DataFrame — the entry point a
    * custom logical operator needs to join the fluent API. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
