package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 split `Column` from Catalyst `Expression` (Connect); the
  * converters live in `classic.ExpressionUtils`, which is `private[sql]`.
  * This bridge re-exports them for graft's custom expressions — the same
  * move Spark's own extensions (e.g. ML) make.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
