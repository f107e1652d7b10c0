package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-wall attribution for the three queries VERDICT r19 item 3
  * flagged as never-profiled: q_fingerprint, q_dup_rate_source,
  * q_semdedup.  Each stage materializes through the noop sink in the
  * bench's session/config; per-stage MIN over reps (constants survive
  * mins).  One JSON line on stdout.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.BlindSpotProbe <sfDir> [reps]
  */
object BlindSpotProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.Pipeline

    val stages = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.ArrayBuffer[Double]]()
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      val sec = (System.nanoTime() - t0) / 1e9
      stages.getOrElseUpdate(name, scala.collection.mutable.ArrayBuffer()) += sec
      System.err.println(f"[blindspot] stage=$name wall_ms=${sec * 1000}%.0f")
    }

    for (_ <- 1 to reps) {
      // -------- q_fingerprint: kernel scan vs the declared final sort
      t("fp_kernel_noorder")(noop(Tables.documents(spark, d).select(col("doc_id"),
        explode(expr("graft_winnow(graft_grams32(text, 8), 4)")).as("fingerprint"))))
      t("fp_full")(noop(Pipeline.qFingerprint(spark, d)))
      spark.catalog.clearCache()
      // -------- q_dup_rate_source: shared pair pipeline vs the attach/agg
      t("dr_minhash_pairs")(noop(
        Pipeline.minhashPairs(spark, d).select("doc_a", "doc_b")))
      t("dr_full")(noop(graft.queries.CorpusStats.qDupRateSource(spark, d)))
      spark.catalog.clearCache()
      // -------- q_semdedup: Lloyd state vs members+cell-self-join+attach
      t("sd_kmeans_assign")(noop {
        val (_, _, a2) = Pipeline.kmeansState(spark, d)
        a2
      })
      spark.catalog.clearCache()
      t("sd_full")(noop(Pipeline.qSemDedup(spark, d)))
      spark.catalog.clearCache()
    }

    val mins = stages.map { case (k, v) => k -> v.min }
    println(mins.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", ",") +
      s""""sf":"$d","reps":$reps,"cpus":$cpus}""")
    spark.stop()
  }
}
