package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Pipeline

/** Giant-component skew evidence for the CC loop (VERDICT r16 item 4,
  * SURVEY §6): in `Pipeline.componentLabels` the pointer-jump join
  * probes `prop` on `label == jdoc`, and once a GIANT near-dup
  * component exists every member carries the same min label — the
  * stream side of that join is hot on one key, the classic min-label
  * CC failure mode (the reason Kiveris et al. alternate
  * large-star/small-star).  At bench scales the loop frames broadcast
  * and no skew is possible; this probe models the 100 TB regime where
  * the label frame exceeds the broadcast budget (`autoBroadcastJoinThreshold
  * = -1`, small advisory partition size — the SkewProbe discipline)
  * and measures the slowest-task record counts through the loop's
  * shuffle stages on:
  *
  *   - `giant`:   one CHAIN over half the docs (worst diameter AND a
  *     single giant component) + 2-cliques over the rest;
  *   - `uniform`: the same edge volume as 2-cliques only.
  *
  * each with AQE skew-join split ON and OFF.  Reported per config:
  * wall, rounds, and the top shuffle stages' (max task records,
  * median-ish records/task, tasks) — the max/mean ratio is the skew
  * signal; a straggler task invisible at 32 cores IS the job at 1000
  * executors.  Labels are asserted identical across configs.
  *
  * Usage: SPARK_GRAFT_CPUS=32 [SPARK_GRAFT_BENCH_OUT=...] \
  *          runMain graft.CcSkewProbe [nDocs]
  */
object CcSkewProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 60000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val probe = Bench.calibrate(25000000)

    // the 100 TB regime: label/edge frames too big to broadcast, and
    // partition geometry proportional to real partitions (without the
    // advisory floor, AQE coalesces the probe's megabyte shuffles to
    // one task and measures nothing)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // this probe measures the DISTRIBUTED loop (the 100 TB path);
    // without this the r18 small-graph fast path would union-find the
    // probe's chain on the driver and measure nothing
    spark.conf.set("spark.graft.cc.localEdgeThreshold", "0")
    // 64k, not SkewProbe's megabytes: the CC loop frames are a few MB
    // at probe scale, and any larger advisory lets AQE coalesce every
    // shuffle to 1-2 tasks — which hides exactly the per-KEY pooling
    // this probe exists to expose
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")

    // one chain over docs [0, n/2) — component {0..n/2-1}, min label 0,
    // diameter n/2 — plus 2-cliques over [n/2, n)
    def giant: DataFrame =
      spark.range(0, n / 2 - 1).select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
        .union(spark.range(n / 2, n - 1, 2)
          .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b")))
    // matched edge volume, no giant component: 2-cliques everywhere
    def uniform: DataFrame = {
      val m = 3 * n / 2 // ~same edge count as giant (3n/4 edges)
      spark.range(0, m - 1, 2).select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    }

    // stageId -> (maxTaskMs, tasks, totalRecords, maxTaskRecords)
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Long, Long)]()
    val nTasks = new AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = Option(t.taskMetrics)
        val recs = m.map(_.shuffleReadMetrics.recordsRead).getOrElse(0L)
        if (recs > 0) {
          nTasks.incrementAndGet()
          stages.merge(t.stageId, (t.taskInfo.duration, 1L, recs, recs),
            (a, b) => (math.max(a._1, b._1), a._2 + b._2, a._3 + b._3,
              math.max(a._4, b._4)))
        }
      }
    }

    def run(name: String, pairs: () => DataFrame, skewJoin: Boolean):
        (String, Double, Int, Long, Long, String) = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewJoin.toString)
      // make the runtime split reachable at probe scale, as SkewProbe
      // does (production defaults trigger at real partition sizes)
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "128k")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      stages.clear(); nTasks.set(0)
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val labels = Pipeline.componentLabels(spark, pairs())
      val sum = labels
        .agg(org.apache.spark.sql.functions.sum(
          col("cluster_id") * (col("doc_id") % 97 + 1)).as("s"))
        .as[Long].first()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      spark.catalog.clearCache()
      import scala.jdk.CollectionConverters._
      // top stages by max task records: where a hot key would pool
      val top = stages.asScala.toSeq.sortBy(-_._2._4).take(5).map {
        case (_, (mt, tasks, total, mx)) =>
          val mean = if (tasks > 0) total.toDouble / tasks else 0.0
          f"""{"max_task_sec":${mt / 1e3}%.3f,"tasks":$tasks,""" +
            s""""records_total":$total,"records_max_task":$mx,""" +
            f""""max_over_mean":${if (mean > 0) mx / mean else 0.0}%.2f}"""
      }.mkString("[", ",", "]")
      (name, sec, Pipeline.lastCcRounds, nTasks.get(), sum, top)
    }

    // warm: JIT the loop pipeline so the first config doesn't pay cold
    // costs alone
    Pipeline.componentLabels(spark, uniform).count()
    spark.catalog.clearCache()

    val runs = Seq(
      run("uniform_skew_on", () => uniform, skewJoin = true),
      run("giant_skew_off", () => giant, skewJoin = false),
      run("giant_skew_on", () => giant, skewJoin = true))
    // giant-mode labels must agree across skew configs (split changes
    // the shuffle layout, never the result)
    val giantSums = runs.filter(_._1.startsWith("giant")).map(_._5)
    require(giantSums.distinct.size == 1, s"giant configs disagree: $giantSums")

    val per = runs.map { case (name, sec, rounds, tasks, sum, top) =>
      s""""$name":{"sec":$sec,"rounds":$rounds,"shuffle_tasks":$tasks,""" +
        s""""label_checksum":$sum,"top_stages_by_max_records":$top}"""
    }.mkString(",")
    val line = s"""{"metric":"cc_giant_skew","n_docs":$n,""" +
      s""""giant_edges":${giant.count()},"uniform_edges":${uniform.count()},""" +
      s"""$per,""" +
      s""""probe":$probe,"load":"${Bench.loadavg()}","cpus":$cpus,""" +
      s""""git_sha":"${Bench.gitSha()}"}"""
    println(line)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { f =>
      java.nio.file.Files.write(java.nio.file.Paths.get(f),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
