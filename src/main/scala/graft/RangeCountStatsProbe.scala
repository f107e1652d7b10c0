package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Print the optimizer sizeInBytes estimate of q_range_count's merged
  * event stream (the quantity `spark.graft.ranked.rangeCountMinBytes`
  * gates on) plus which form the query picks at that estimate — the
  * committed evidence for the r20 default swap point.
  *
  * Usage: SPARK_GRAFT_CPUS=8 runMain graft.RangeCountStatsProbe <sfDir>...
  */
object RangeCountStatsProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RangeCountStatsProbe <sfDir>...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { d =>
      // the same evF construction as Genomic.qRangeCount
      val r = Tables.lineitem(spark, d).select(
        col("l_returnflag").as("contig"),
        expr("(l_partkey * 3) % 1000").as("pos"),
        lit(0).as("flag"), lit(1L).as("delta"), lit(-1L).as("target_id"))
      val t = Tables.part(spark, d).select(
        expr("CASE p_partkey % 3 WHEN 0 THEN 'A' WHEN 1 THEN 'N' ELSE 'R' END").as("contig"),
        expr("(p_partkey * 7) % 1000").as("pos"),
        lit(1).as("flag"), lit(0L).as("delta"), col("p_partkey").as("target_id"))
      val ev = r.unionAll(t)
      val statBytes = ev.queryExecution.optimizedPlan.stats.sizeInBytes
      val fileBytes = Seq("lineitem.parquet", "part.parquet").map { n =>
        val hp = new org.apache.hadoop.fs.Path(s"$d/$n")
        val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(hp)) fs.getContentSummary(hp).getLength else 0L
      }.sum
      val minBytes = spark.conf.get(
        "spark.graft.ranked.rangeCountMinBytes",
        graft.queries.Genomic.RangeCountRankedMinBytes).toLong
      println(s"[rangecount-stats] sf=$d evStatsBytes=$statBytes " +
        s"inputFileBytes=$fileBytes minBytes=$minBytes " +
        s"form=${if (minBytes >= 0 && fileBytes > minBytes) "ranked" else "window"}")
    }
    spark.stop()
  }
}
