package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Expression ↔ Column converters,
  * needed to expose graft's native Catalyst expressions
  * (graft.functions.VectorExpressions) as user-facing Columns. Same
  * approach most third-party Spark extension libraries take.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Materialize a programmatically-built logical plan as a DataFrame
    * (Dataset.ofRows is private[sql]); used by graft.plans for custom
    * whole-operator nodes.
    */
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
