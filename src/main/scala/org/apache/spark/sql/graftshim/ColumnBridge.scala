package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal bridge to Spark's `private[sql]` Column ⇄ Expression converters — the one
 * hook an extension library needs to wrap a custom Catalyst [[Expression]] carrying
 * RUNTIME data (e.g. a driver-collected probe set) into a [[Column]], which the
 * literal-only FunctionRegistry path cannot express. Lives under
 * `org.apache.spark.sql` solely for access; contains no logic.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
