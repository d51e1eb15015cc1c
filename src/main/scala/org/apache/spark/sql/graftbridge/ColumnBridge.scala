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

  /** Column names an unresolved Column references (walks the `private[sql]`
    * ColumnNode tree — the converted Expression is one opaque
    * ColumnNodeExpression, so catalyst-side collect sees nothing). Used by
    * SJoin to ship exactly the left columns a user's aggs/lookups name.
    */
  def attributeNames(c: Column): Seq[String] =
    c.node.collect {
      case a: org.apache.spark.sql.internal.UnresolvedAttribute => a.nameParts.last
    }
}
