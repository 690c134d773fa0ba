package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal bridge into the `private[sql]` surface: building a DataFrame
  * from a programmatically-constructed [[LogicalPlan]] (here: the custom
  * AsOfJoinNode) has no public API, so this one-liner lives in a
  * `org.apache.spark.sql` subpackage. Nothing else may be added here. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
