package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 made the classic conversion
  * helpers `private[sql]`; extension libraries reach them from an
  * `org.apache.spark.sql` subpackage (the usual pattern for third-party
  * Catalyst expressions — no internals are modified, only re-exported).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
