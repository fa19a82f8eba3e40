package org.apache.spark.sql.graft

import _root_.graft
import org.apache.spark.sql.{classic, execution, Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.SparkStrategy

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

  /** Analyzed logical plan of a DataFrame (for building custom plans). */
  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** Wrap a custom LogicalPlan back into a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Planner strategy for graft.plans.AsOfJoinPlan. Lives here because
    * `SparkStrategy`/`planLater` are private[sql] in Spark 4. */
  object AsOfStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[execution.SparkPlan] =
      plan match {
        case graft.plans.AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
          graft.plans.AsOfJoinExec(
            planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
        case _ => Nil
      }
  }
}
