package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column<->Expression conversion (the same
  * mechanism org.apache.spark.sql.functions uses internally) so graft's
  * native expressions can be exposed as Columns. Lives under
  * org.apache.spark.sql by necessity; keep it to these two calls.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
