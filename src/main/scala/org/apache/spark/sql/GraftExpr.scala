package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Catalyst Expression bridge. Spark 4 made the converters
  * `private[sql]` (org.apache.spark.sql.classic.ExpressionUtils), so
  * wrapping a custom codegen'd Expression (graft.canon.CanonicalizeUrl)
  * in a user-facing Column needs this one-file shim in the sql package —
  * the standard extension-point workaround; no Spark internals are
  * modified.
  */
object GraftExpr {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
