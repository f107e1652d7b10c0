package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc probe main: time named SparkEntry queries against an
  * arbitrary table directory (e.g. a scaled-up copy under /tmp).
  *
  *   sbt "runMain graft.Probe /tmp/sf10x q_dedup_minhash q_dedup_cluster"
  *
  * Each query runs twice (cold incl. codegen, then steady state),
  * mirroring Bench's methodology.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Probe <sfDir> <queryName>...")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query $name"))
      def once(): (Long, Double) = {
        val t0 = System.nanoTime()
        // noop sink for the timing (full materialization, nothing
        // prunable — see Bench), count() separately for the row count
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        val rows = df.count()
        spark.catalog.clearCache()
        (rows, t)
      }
      val (rows, cold) = once()
      val (_, warm) = once()
      println(f"PROBE $name%-20s rows=$rows%-8d cold=$cold%6.2fs steady=$warm%6.2fs")
    }
    spark.stop()
  }
}
