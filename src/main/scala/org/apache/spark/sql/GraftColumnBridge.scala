package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ catalyst Expression bridge for the classic engine.
  *
  * Spark 4 hides `Column.expr` behind `private[sql]`
  * (`classic.ExpressionUtils` in columnNodeSupport.scala); extensions
  * that define native expressions conventionally bridge from inside
  * the `org.apache.spark.sql` package. Used by graft.vector to expose
  * its codegen kernels as Columns.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
