package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression bridge.
  *
  * Spark 4 moved `Column` to the backend-agnostic sql-api module and gated
  * the classic-backend conversion helpers (`classic.ExpressionUtils`)
  * behind `private[sql]`. Custom native expressions still need them, so
  * this one-file subpackage of org.apache.spark.sql re-exports the two
  * conversions — the established pattern for Spark-extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
