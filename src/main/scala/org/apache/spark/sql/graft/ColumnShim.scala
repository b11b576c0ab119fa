package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between custom Catalyst `Expression`s and the public `Column`
  * API. Spark 4 wraps columns in `ColumnNode`s; the converter lives in
  * `org.apache.spark.sql.classic` with `private[sql]` visibility, so this
  * shim sits under the sql package — the standard technique used by
  * public Spark extension libraries.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
