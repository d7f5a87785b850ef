package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ catalyst-Expression bridge for graft's native expressions.
  *
  * `classic.ExpressionUtils` is `private[sql]`, so this one-file shim lives in
  * the `org.apache.spark.sql` package — the standard pattern Spark extension
  * libraries use to attach custom catalyst `Expression`s to the public Column
  * API without a session-level function registry. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
