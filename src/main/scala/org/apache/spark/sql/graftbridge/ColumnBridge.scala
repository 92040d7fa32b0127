package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the `private[sql]` Column↔Expression converters —
  * the one place graft touches Spark internals. Custom Catalyst
  * expressions (graft.functions.SimHash64) need it to surface as
  * `Column`s without per-session function registration. Lives in a
  * subpackage of org.apache.spark.sql for access, the established
  * pattern for Spark extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
