package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and Catalyst Expressions —
  * Spark 4 made the converters `private[sql]`, so this lives in an
  * org.apache.spark.sql subpackage.
  */
object shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a Column's node tree to a Catalyst expression
    * (UnresolvedFunction names resolved via the registry) — what the
    * classic Dataset API does on select; needed when building
    * expressions outside a Dataset, e.g. inside optimizer rules. */
  def convert(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
