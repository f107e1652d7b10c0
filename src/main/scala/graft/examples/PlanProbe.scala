package graft.examples

/** Plan-shape diagnostic: prints scan/exchange/reuse counts per query
  * so shape regressions (double scans, lost ReusedExchange, missing
  * WindowGroupLimit) show up without reading full explain output.
  *
  *   sbt "runMain graft.examples.PlanProbe /root/testdata/sf0.01 q_cooccur ..."
  *
  * With no query names, probes every SparkEntry query.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val s = graft.GraftSession.local(8)
    s.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(s, d)
      df.collect() // materialize: AQE only finalizes stage reuse at runtime
      val p = df.queryExecution.executedPlan.toString
      def c(pat: String) = pat.r.findAllIn(p).length
      println(f"$n%-22s scans=${c("Scan parquet")} exchanges=${c("(?<!Reused)Exchange ")} " +
        f"reused=${c("ReusedExchange")} bhj=${c("BroadcastHashJoin")} " +
        f"smj=${c("SortMergeJoin")} wgl=${c("WindowGroupLimit")} " +
        f"cartesian=${c("Cartesian|BroadcastNestedLoop")}")
    }
    s.stop()
  }
}
