// Lives in org.apache.spark.sql so it can reach the classic Column <->
// Expression converters (private[sql] in Spark 4): graft code needs to
// place a native Expression (functions.DecimalDot) INSIDE a higher-order
// function lambda, where only the Column DSL is available — the function
// registry (expr("decimal_dot(...)")) cannot reference lambda variables.
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
