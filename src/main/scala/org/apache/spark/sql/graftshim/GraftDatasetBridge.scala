package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to `classic.Dataset.ofRows`, which is `private[sql]` — the one
  * blessed way to wrap a custom LogicalPlan node as a DataFrame. Lives in
  * an `org.apache.spark.sql` subpackage solely to satisfy that access
  * qualifier; contains no other logic. */
object GraftDatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
