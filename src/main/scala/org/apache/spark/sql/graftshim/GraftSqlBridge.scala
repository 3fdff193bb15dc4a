package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway the library needs: constructing a
  * DataFrame from a custom LogicalPlan (`Dataset.ofRows`). Lives in an
  * `org.apache.spark.sql` subpackage solely to satisfy that access scope —
  * everything else in the engine uses public APIs. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
