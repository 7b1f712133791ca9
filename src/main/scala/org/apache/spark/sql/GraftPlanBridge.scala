package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** Minimal bridge into the `private[sql]` Dataset constructor so graft's
  * custom logical plans (graft.plans.*) can become DataFrames. This is
  * the standard extension-library idiom (an `org.apache.spark.sql` shim
  * package); nothing else of Spark's internals is re-exported. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)
}
