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
}
