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

  /** The SESSION's Hadoop configuration as a broadcast, for
    * executor-side FileSystem access (cloud-FS credentials and scheme
    * mappings live in spark.hadoop.*, NOT in executor defaults).
    * `sessionState.newHadoopConf()` — not `sc.hadoopConfiguration` —
    * so runtime per-session overrides (`spark.conf.set` of
    * spark.hadoop.* credentials) reach executors too.
    * `SerializableConfiguration` is private[spark], so the broadcast is
    * surfaced untyped and unwrapped here. */
  def hadoopConfBroadcast(spark: SparkSession)
      : org.apache.spark.broadcast.Broadcast[_] =
    spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        sessionHadoopConf(spark)))

  def hadoopConf(b: org.apache.spark.broadcast.Broadcast[_])
      : org.apache.hadoop.conf.Configuration =
    b.value.asInstanceOf[org.apache.spark.util.SerializableConfiguration]
      .value

  /** Driver-side session Hadoop conf (sc defaults + spark.hadoop.* +
    * session runtime overrides) — `sessionState` is private[sql]. */
  def sessionHadoopConf(spark: SparkSession)
      : org.apache.hadoop.conf.Configuration =
    spark.asInstanceOf[CSparkSession].sessionState.newHadoopConf()
}
