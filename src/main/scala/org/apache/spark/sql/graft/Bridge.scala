package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` Column↔Expression seam.
  *
  * Spark 4 hides the classic `new Column(expr)` constructor behind
  * `org.apache.spark.sql.classic.ExpressionUtils`; a package-qualified
  * shim is the standard way for a library to expose its own native
  * Catalyst expressions as user-facing Columns (same access technique
  * Spark's own connectors use). Keep this file tiny: everything else in
  * the engine lives in the public API.
  */
object Bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
