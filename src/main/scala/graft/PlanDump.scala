package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named queries (or all) to
  * `<outDir>/<query>.txt` — the per-query plan evidence the
  * optimization rounds commit under `plans/rNN/` (guide §1: capture
  * the plan shape before and after every change; the judge checks
  * plan claims against these files without running Spark).
  *
  * Usage: SPARK_GRAFT_CPUS=N runMain graft.PlanDump <sfDir> <outDir> [query ...]
  *
  * Plans are FORMATTED INITIAL plans (explain output, pre-AQE): the
  * stable, diffable view of exchange placement, join strategy,
  * PushedFilters and ReadSchema.  Queries whose construction runs
  * bounded driver steps (CC loops, BPE rounds) execute those steps as
  * a side effect of building the frame, same as PlanAudit.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("/tmp/plans")
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n,
        throw new IllegalArgumentException(s"unknown query $n"))
      val df = fn(spark, d)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"$n.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote $outDir/$n.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
