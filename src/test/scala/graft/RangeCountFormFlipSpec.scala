package graft

import graft.queries.Genomic

/** q_range_count's r20 size-based form flip
  * (`spark.graft.ranked.rangeCountMinBytes`, VERDICT r19 item 7): the
  * window form and the distributed RankedPrefixSum form must return
  * identical rows, and the flip must respect the -1 (never) / 0
  * (always) sentinels.  The gate SFs sit below the 22 MB default, so
  * the oracle pins the window form; THIS spec pins the ranked form the
  * default selects above ~sf0.2. */
class RangeCountFormFlipSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"
  private val conf = "spark.graft.ranked.rangeCountMinBytes"

  private def run(minBytes: String): Seq[String] = {
    spark.conf.set(conf, minBytes)
    try Genomic.qRangeCount(spark, sf).collect()
      .map(r => s"${r.getLong(0)}|${r.getLong(1)}").toSeq
    finally spark.conf.unset(conf)
  }

  test("ranked form (forced) equals window form (disabled) row-for-row") {
    val window = run("-1")
    val ranked = run("0")
    assert(ranked == window)
    assert(window.nonEmpty)
  }

  test("default keeps the window form at gate SF (inputs ~1 MB < 22 MB)") {
    spark.conf.unset(conf)
    val plan = Genomic.qRangeCount(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window") || plan.contains("RunningWindow"),
      s"expected the window form at ${sf}:\n${plan.take(2000)}")
    assert(!plan.contains("RankedPrefixSum"),
      "ranked form must not fire below the size threshold")
  }

  test("forced ranked form actually plans RankedPrefixSum") {
    spark.conf.set(conf, "0")
    try {
      val plan = Genomic.qRangeCount(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("RankedPrefixSum"),
        s"expected ranked nodes:\n${plan.take(2000)}")
    } finally spark.conf.unset(conf)
  }
}
