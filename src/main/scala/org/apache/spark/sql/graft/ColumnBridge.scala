package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ↔ Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`). Lives inside the
  * `org.apache.spark.sql` package scope to satisfy the access modifier —
  * the standard technique for Spark extension libraries that construct
  * custom Catalyst expressions as Columns directly (instead of routing
  * every expression through the session-global function registry, whose
  * last-registration-wins semantics are unsafe for expressions carrying
  * per-call state such as an index matrix).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
