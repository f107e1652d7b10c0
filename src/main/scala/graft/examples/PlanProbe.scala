package graft.examples

/** Plan-shape diagnostic: prints scan/exchange/reuse counts per query
  * so shape regressions (double scans, lost ReusedExchange, missing
  * WindowGroupLimit) show up without reading full explain output.
  *
  *   sbt "runMain graft.examples.PlanProbe /root/testdata/sf0.01 q_cooccur ..."
  *
  * With no query names, probes every SparkEntry query.  Pass --full to
  * also print each query's complete executed plan.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val full = args.contains("--full")
    val rest = args.filterNot(_ == "--full")
    val d = rest.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (rest.length > 1) rest.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val s = graft.GraftSession.local(8)
    s.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = graft.SparkEntry.queries.getOrElse(n,
        throw new IllegalArgumentException(s"unknown query $n"))(s, d)
      // Materialize THIS QueryExecution (a noop write would plan a
      // separate one, leaving executedPlan un-finalized under AQE so
      // ReusedExchange never appears); toRdd keeps rows off the driver.
      df.queryExecution.toRdd.foreach(_ => ())
      val p = df.queryExecution.executedPlan.toString
      if (full) println(p)
      def c(pat: String) = pat.r.findAllIn(p).length
      println(f"$n%-22s scans=${c("Scan parquet")} exchanges=${c("(?<!Reused)Exchange ")} " +
        f"reused=${c("ReusedExchange")} bhj=${c("BroadcastHashJoin")} " +
        f"smj=${c("SortMergeJoin")} wgl=${c("WindowGroupLimit")} " +
        f"cartesian=${c("Cartesian|BroadcastNestedLoop")}")
    }
    s.stop()
  }
}
