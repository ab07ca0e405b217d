package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge between library-defined Catalyst [[Expression]]s and the public
 * [[Column]] API. Spark 4 made the converters `private[sql]`
 * (org.apache.spark.sql.classic.ExpressionUtils), so the bridge lives in
 * an org.apache.spark.sql subpackage — no Spark internals are modified.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
