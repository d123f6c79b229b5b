package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 made `Column.expr` / `classic.ExpressionUtils`
  * `private[sql]`; the established extension-library workaround is a
  * tiny bridge object inside the `org.apache.spark.sql` package (the
  * same technique Spark-ecosystem libraries use to expose typed
  * expressions as Columns).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
