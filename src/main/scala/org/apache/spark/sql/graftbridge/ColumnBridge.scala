package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst Expression bridge. `ExpressionUtils` is `private[sql]`,
  * so this one-file shim lives under `org.apache.spark.sql` — the standard
  * pattern for Spark-native extension libraries. Everything else in graft
  * stays in its own namespace.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
