package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame => CDataFrame, Dataset => CDataset, SparkSession => CSparkSession}

/** Package-private bridge: building a DataFrame from a custom LogicalPlan
  * (`Dataset.ofRows`) is `private[sql]`, so third-party operators that add
  * logical nodes need this one-liner inside the sql package — the standard
  * pattern for Spark extension libraries. */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)
}
