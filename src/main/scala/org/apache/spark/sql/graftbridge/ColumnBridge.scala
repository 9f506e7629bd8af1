package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4's Connect-compatible `Column` no
  * longer exposes `expr`, and the classic-side converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`) are `private[sql]` —
  * so this one-file shim lives inside the `org.apache.spark.sql` package
  * tree, the same approach public Spark extension libraries use to plug
  * custom Catalyst expressions into the DataFrame API. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
