package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column construction go through the (package-private)
  * classic.ExpressionUtils; this bridge re-exports the two conversions the
  * graft expressions need. Standard pattern for Spark extension libraries
  * that define native Catalyst expressions.
  */
object ColumnBridgeImpl {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
