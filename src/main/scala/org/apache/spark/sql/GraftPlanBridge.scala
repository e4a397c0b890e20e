package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

/** Package-placed bridge: lets the graft library wrap a custom
  * logical plan in a DataFrame (`Dataset.ofRows` is private[sql]).
  * Standard extension-library pattern — no Spark internals are
  * modified, only constructed.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)
}
