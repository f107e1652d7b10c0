package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** Optimizer-rule injection point (range-join rewrite lands here). */
object GraftPlans {
  def inject(e: SparkSessionExtensions): Unit = {
    val _ = e
  }
}
