package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the package-private `Dataset.ofRows`: lets graft wrap a
  * custom logical node ([[graft.plans.RankedPrefixSum]]) in a
  * DataFrame.  The in-package accessor object is the standard pattern
  * for Spark extension libraries that build plans directly. */
object GraftDatasetAccess {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
}
