package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's `private[sql]` Column ↔ Expression conversion.
  *
  * Spark 4 unified the Column API behind ColumnNode and made the classic
  * converters `private[sql]`; a library adding native Catalyst
  * expressions (e.g. graft.functions.Fnv1a64) still needs them. This is
  * the one sanctioned-by-visibility way in: a single object inside the
  * `org.apache.spark.sql` package, kept to two forwarding methods.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
