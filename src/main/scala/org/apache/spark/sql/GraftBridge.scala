package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for third-party Catalyst expressions.
  * `ExpressionUtils` is private[sql] in Spark 4; this is the standard
  * extension-package technique for exposing a custom Expression as a
  * user-facing Column. */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
