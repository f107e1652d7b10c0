package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Catalyst extension entry point. Injects graft's native SQL functions
  * and optimizer rules (see graft.plans.RangeJoinRule). Usable either via
  * `GraftSession.local()` or
  * `--conf spark.sql.extensions=graft.GraftExtensions` on a real cluster.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    functions.GraftFunctions.inject(e)
    plans.GraftPlans.inject(e)
  }
}
