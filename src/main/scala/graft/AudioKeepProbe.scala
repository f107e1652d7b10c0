package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-wall breakdown for `q_audio_cluster_keep` (VERDICT r18 item
  * 4): the key's sf0.1 cost is a scale-INDEPENDENT ~8 s constant (sf1
  * runs FASTER) — so it is stage overhead, not data.  This probe
  * times each pipeline stage in isolation, each materialized by the
  * cheapest honest action, in the same session/config the bench uses:
  *
  *   decode    — sigFrame(+localCheckpoint): WAV synth + PCM decode +
  *               envelope dHash over every doc (scan-local)
  *   distinct  — distinct sigs off the checkpointed frame
  *   pairs     — banded hamming sig join (HammingDedup.sigPairs)
  *   cc        — componentLabelsBySig (fast path or loop; rounds in
  *               Pipeline.lastCcRounds)
  *   keeper    — the full query tail (window + join + orderBy) run
  *               end-to-end, minus the sum above = residual
  *
  * Emits one stderr line per stage ([audioprof] stage=… wall_ms=…,
  * the SPARK_GRAFT_CC_LOG convention) and one summary JSON line on
  * stdout.  3 reps; per-stage MIN reported (the constant under
  * study survives mins — contention does not). */
object AudioKeepProbe {

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.{AudioDedup, Pipeline}
    import graft.operators.HammingDedup

    def t[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val stages = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.ArrayBuffer[Double]]()
    def rec(name: String, sec: Double): Unit = {
      stages.getOrElseUpdate(name, scala.collection.mutable.ArrayBuffer()) += sec
      System.err.println(f"[audioprof] stage=$name wall_ms=${sec * 1000}%.0f")
    }

    for (rep <- 1 to reps) {
      System.err.println(s"[audioprof] rep=$rep")
      val (tDecode, sigs) = t(AudioDedup.sigFrame(spark, d).localCheckpoint())
      rec("decode_sigframe", tDecode)
      val (tDistinct, uniq) =
        t { val u = sigs.select(col("sig")).distinct().localCheckpoint(); u }
      rec("distinct_sigs", tDistinct)
      val (tPairs, sigPairs) = t {
        val p = HammingDedup
          .sigPairs(uniq, "sig", AudioDedup.MaxDist, bandBits = 16)
          .select("sig_a", "sig_b").localCheckpoint()
        p
      }
      rec("banded_pairs", tPairs)
      val (tCc, labels) = t(Pipeline
        .componentLabelsBySig(spark, sigs.select("doc_id", "sig"), sigPairs)
        .localCheckpoint())
      rec("cc_labels", tCc)
      System.err.println(s"[audioprof] cc_rounds=${Pipeline.lastCcRounds}")
      val (tKeeper, _) = t {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("cluster_id")
          .orderBy(desc("n_samples"), col("doc_id"))
        labels.join(sigs.select("doc_id", "n_samples"), "doc_id")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("cluster_id"), col("doc_id").as("keeper"), col("n_samples"))
          .orderBy("cluster_id").count()
      }
      rec("keeper_window", tKeeper)
      // the gated query end-to-end in this same JVM — the number the
      // bench sees; e2e - sum(stages) = harness/lineage residual
      val (tFull, n) = t(AudioDedup.qAudioClusterKeep(spark, d).count())
      rec("full_query", tFull)
      System.err.println(s"[audioprof] clusters=$n")
      spark.catalog.clearCache()
    }

    val mins = stages.map { case (k, v) => k -> v.min }
    val parts = mins.filter(_._1 != "full_query")
    val json = mins.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", ",") +
      f""""stage_sum":${parts.values.sum}%.3f,"sf":"$d","reps":$reps,""" +
      s""""cpus":$cpus,"cc_rounds_last":${Pipeline.lastCcRounds}}"""
    println(json)
    spark.stop()
  }
}
