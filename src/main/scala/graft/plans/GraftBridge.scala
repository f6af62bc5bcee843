package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `private[sql]` access shim: building a DataFrame from a custom
  * LogicalPlan needs `classic.Dataset.ofRows`, which Spark scopes to its
  * own package tree — the standard extension-library pattern is a bridge
  * object in a `org.apache.spark.sql` subpackage. No Spark internals are
  * modified. */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
