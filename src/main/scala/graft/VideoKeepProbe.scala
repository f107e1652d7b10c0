package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-wall breakdown for `q_video_cluster_keep` / `_dup` (r19: the
  * two keys lead the clean-window sf0.1 bench at ~5.0s / ~3.6s — the
  * [[graft.AudioKeepProbe]] discipline applied to the frame-set
  * pipeline).  Stages, each materialized by the cheapest honest
  * action in the bench's session/config:
  *
  *   decode     — frameSigs(+localCheckpoint): AVI walk + PNG decode +
  *                dHash + per-video distinct (scan-local)
  *   setcollapse— docSets agg (sort_array(collect_set)) + fhash +
  *                fsets bucket agg, localCheckpoint'd
  *   pairs      — sharedFramePairsTol over the representative sigs
  *                (guard aggs + banded hamming join)
  *   cc         — Pipeline.componentLabels over the set pairs
  *   attach     — docFset join + cluster agg + keeper window + sort
  *   full_query — the gated query end-to-end (count), same JVM
  *
  * One stderr line per stage ([videoprof] …); one JSON line on
  * stdout; 3 reps, per-stage MIN (constants survive mins).
  *
  * Usage: runMain graft.VideoKeepProbe <sfDir> [reps] [dup]
  */
object VideoKeepProbe {

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val dup = args.contains("dup")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.{Pipeline, VideoDedup}

    def t[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    val stages = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.ArrayBuffer[Double]]()
    def rec(name: String, sec: Double): Unit = {
      stages.getOrElseUpdate(name, scala.collection.mutable.ArrayBuffer()) += sec
      System.err.println(f"[videoprof] stage=$name wall_ms=${sec * 1000}%.0f")
    }

    for (rep <- 1 to reps) {
      System.err.println(s"[videoprof] rep=$rep dup=$dup")
      val (tDecode, sigs) = t {
        val f =
          if (dup) VideoDedup.sigsOf(spark, VideoDedup.videoPayloadsDup(spark, d))
          else VideoDedup.frameSigs(spark, d, perturb = true)
        f.localCheckpoint()
      }
      rec("decode_framesigs", tDecode)
      val (tCollapse, (docFset, fsets)) = t {
        val docSets = sigs.groupBy("doc_id")
          .agg(sort_array(collect_set(col("fsig"))).as("fset"))
          .withColumn("fhash", xxhash64(col("fset")))
          .withColumn("n_frames", size(col("fset")).cast("long"))
          .localCheckpoint()
        val fsets = docSets.groupBy("fhash")
          .agg(min("doc_id").as("raw_id"),
            min("fset").as("fset"), max("fset").as("fset_max"))
          .select(col("fhash"),
            VideoDedup.checkedFsetId(col("raw_id"), col("fset"),
              col("fset_max"), col("fhash")).as("fset_id"),
            col("fset"))
          .localCheckpoint()
        val docFset = docSets.join(fsets.select("fhash", "fset_id"), "fhash")
          .select("doc_id", "fset_id", "n_frames").localCheckpoint()
        (docFset, fsets)
      }
      rec("set_collapse", tCollapse)
      val (tPairs, pairs) = t {
        val repSigs = fsets.select(col("fset_id").as("doc_id"),
          explode(col("fset")).as("fsig"))
        VideoDedup.sharedFramePairsTolUnordered(repSigs)
          .select("doc_a", "doc_b").localCheckpoint()
      }
      rec("banded_pairs", tPairs)
      val (tCc, labels) = t(Pipeline.componentLabels(spark, pairs).localCheckpoint())
      rec("cc_labels", tCc)
      System.err.println(s"[videoprof] cc_rounds=${Pipeline.lastCcRounds}")
      val (tAttach, _) = t {
        import org.apache.spark.sql.expressions.Window
        val setLabels = labels
          .select(col("doc_id").as("fset_id"), col("cluster_id").as("fgroup"))
        val grouped = docFset.join(setLabels, Seq("fset_id"), "left")
          .withColumn("g", coalesce(col("fgroup"), col("fset_id")))
        val clusters = grouped.groupBy("g")
          .agg(min("doc_id").as("cluster_id"), count(lit(1)).as("n"))
          .filter(col("n") >= 2)
          .select("g", "cluster_id")
        val w = Window.partitionBy("cluster_id")
          .orderBy(desc("n_frames"), col("doc_id"))
        grouped.join(clusters, "g")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("cluster_id"), col("doc_id").as("keeper"), col("n_frames"))
          .orderBy("cluster_id").count()
      }
      rec("attach_keeper", tAttach)
      val (tFull, n) = t {
        (if (dup) VideoDedup.qVideoClusterKeepDup(spark, d)
         else VideoDedup.qVideoClusterKeep(spark, d)).count()
      }
      rec("full_query", tFull)
      System.err.println(s"[videoprof] clusters=$n")
      // drift guard (ADVICE r19): the staged attach path re-implements
      // clusterKeepBySet inline — if the production path changes, the
      // stage attribution silently measures the wrong pipeline unless
      // the cluster counts agree
      if (rep == 1) {
        val staged = docFset.join(
            labels.select(col("doc_id").as("fset_id"), col("cluster_id").as("fgroup")),
            Seq("fset_id"), "left")
          .withColumn("g", coalesce(col("fgroup"), col("fset_id")))
          .groupBy("g").agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") >= 2).count()
        require(staged == n,
          s"probe stage drift: staged cluster count $staged != full query $n")
      }
      spark.catalog.clearCache()
    }

    val mins = stages.map { case (k, v) => k -> v.min }
    val parts = mins.filter(_._1 != "full_query")
    val json = mins.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", ",") +
      f""""stage_sum":${parts.values.sum}%.3f,"sf":"$d","reps":$reps,""" +
      s""""dup":$dup,"cpus":$cpus}"""
    println(json)
    spark.stop()
  }
}
