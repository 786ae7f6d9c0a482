package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` bridge: build a DataFrame from a custom
  * LogicalPlan (`Dataset.ofRows` is package-private). This is the
  * standard pattern for third-party Spark operator libraries — the one
  * place the library reaches into the `org.apache.spark.sql` package.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
