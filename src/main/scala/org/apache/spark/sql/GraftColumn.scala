package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between raw Catalyst Expressions and user-facing Columns (the
  * converters are sql-package-private in Spark 4, so the bridge lives in
  * the package — the same pattern Spark extension libraries use). */
object GraftColumn {
  def of(e: Expression): Column = ExpressionUtils.column(e)
  def exprOf(c: Column): Expression = ExpressionUtils.expression(c)
}
