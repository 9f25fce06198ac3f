package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for the private[sql] Column <-> Expression bridge
  * (Spark 4 moved Column onto ColumnNode; custom Catalyst expressions
  * still need the classic converter). Public Spark API surface only —
  * same technique any Spark extension library uses.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
