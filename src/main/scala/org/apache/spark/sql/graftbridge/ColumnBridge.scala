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
    * ColumnNodeExpression, so catalyst-side collect sees nothing). Returns
    * None when the tree contains a node whose references CANNOT be
    * enumerated without an analyzer — `expr("...")` (unparsed SQL text), a
    * star, or a raw wrapped Expression — so callers must assume every
    * column may be referenced. Used by SJoin to ship exactly the left
    * columns a user's aggs/lookups name.
    */
  def attributeNames(c: Column): Option[Seq[String]] = {
    import org.apache.spark.sql.internal
    val opaque = c.node.collect {
      case _: internal.SqlExpression => true // expr("…"): names live in SQL text
      case _: internal.UnresolvedStar => true
      case _: internal.UnresolvedRegex => true // colRegex("…"): names need the schema
      case _: org.apache.spark.sql.classic.ExpressionColumnNode => true // pre-built catalyst Expression
    }
    if (opaque.nonEmpty) None
    else Some(c.node.collect {
      case a: internal.UnresolvedAttribute => a.nameParts.last
    })
  }
}
