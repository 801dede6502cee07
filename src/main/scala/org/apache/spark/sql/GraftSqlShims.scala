package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Package-scoped bridge for graft's custom logical plans:
  * `Dataset.ofRows` is `private[sql]`, so turning a hand-constructed
  * [[LogicalPlan]] back into a user-facing DataFrame needs one forwarder
  * inside the `org.apache.spark.sql` package — the standard technique
  * Spark extension libraries use (Delta, Sedona, Iceberg all ship such a
  * shim). Nothing else in graft lives outside the `graft` package. */
object GraftSqlShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
