package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Dataset constructor so graft's custom
  * logical operators (graft.plans.GroupedTopKNode) can be wrapped in a
  * DataFrame. Public Spark offers no stable API for "DataFrame from a
  * LogicalPlan"; this is the conventional extension-point shim (one
  * line, no behavior). */
object GraftPlanBridge {
  def ofRows(session: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(session.asInstanceOf[classic.SparkSession], plan)
}
