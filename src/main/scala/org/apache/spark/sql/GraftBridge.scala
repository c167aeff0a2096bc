package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal accessor for `Dataset.ofRows`, which is `private[sql]`: the
  * supported way for a library to wrap a custom [[LogicalPlan]] node
  * (graft.plans.RangeJoinPlan) in a user-facing DataFrame. Lives in the
  * `org.apache.spark.sql` package for visibility only; no Spark
  * internals are modified. */
object GraftBridge {
  def ofRows(s: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)

  /** Column ⇄ Expression adapters (`private[sql]` in Spark 4's column
    * API) — lets the library apply its native codegen kernels through
    * the Column API without a per-session registry round-trip. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
