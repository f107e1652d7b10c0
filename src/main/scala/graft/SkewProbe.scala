package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Measured skew evidence for the Skew operator row (SURVEY §2.2 O16 /
  * §6): build a PATHOLOGICALLY hot join key — `hotPct`% of lineitem
  * remapped onto ONE suppkey — and run the same dim join three ways:
  *
  *   - `naive`:  plain shuffle join, AQE skew split OFF.  One task
  *     owns the hot key; its duration ≈ the whole join.
  *   - `aqe`:    Spark's runtime answer — AQE skew-join split ON
  *     (thresholds lowered so the split triggers at probe scale; the
  *     production defaults trigger at real 100-TB partition sizes).
  *   - `salted`: the explicit [[Skew.saltedJoin]] — deterministic
  *     salts spread the hot key BEFORE the shuffle, dim replicated
  *     per salt; the tool for shapes AQE can't rebalance (e.g. the
  *     hot key's rows must still co-group downstream).
  *
  * Broadcast is disabled throughout: with a broadcastable dim there
  * is no skew problem to solve (the probe models the 100-TB regime
  * where the dim side exceeds the broadcast budget).
  *
  * Per strategy: wall seconds, MAX single-task seconds (the skew
  * signal — a straggler task is invisible in wall time at 32 cores
  * but IS the job at 1000 executors), task count, and a result
  * checksum asserted IDENTICAL across strategies (salting must change
  * nothing but the shuffle layout).
  *
  * Usage: SPARK_GRAFT_CPUS=32 [SPARK_GRAFT_BENCH_OUT=...] \
  *          runMain graft.SkewProbe <sfDir> [hotPct] [nSalts]
  */
object SkewProbe {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SkewProbe <sfDir> [hotPct] [nSalts]")
    val dir = args(0)
    val hotPct = if (args.length > 1) args(1).toInt else 50
    val nSalts = if (args.length > 2) args(2).toInt else 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val probe = Bench.calibrate(25000000)

    // the dim side must not broadcast, or there is nothing to measure
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // probe-scale partitions are megabytes, not the gigabytes of a
    // 100-TB run — left at the 64 MB default, AQE's partition
    // COALESCING merges everything (including the salted spread) back
    // into one task and the probe measures nothing.  A small advisory
    // size, uniform across strategies, keeps the partition geometry
    // proportional to the real regime.
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")

    val hot = 1L
    val big = Tables.lineitem(spark, dir)
      .select(col("l_suppkey").as("suppkey"), col("l_quantity"), col("l_orderkey"))
      .withColumn("suppkey",
        when(pmod(hash(col("l_orderkey")), lit(100)) < lit(hotPct), lit(hot))
          .otherwise(col("suppkey")))
    val sup = Tables.supplier(spark, dir)
      .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))

    // the skew signal is the longest SHUFFLE-READ task (the join/agg
    // side); scan-stage tasks are skew-free by construction and would
    // drown the salted case's improvement if counted
    val maxTaskMs = new AtomicLong(0)
    val nTasks = new AtomicLong(0)
    // per-stage detail:
    // stageId -> (maxTaskMs, tasks, maxShuffleReadBytes, spillBytes, maxGcMs)
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Long, Long, Long)]()
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = Option(t.taskMetrics)
        val shuffleRead = m.map(_.shuffleReadMetrics.totalBytesRead).getOrElse(0L)
        if (shuffleRead > 0) {
          maxTaskMs.getAndUpdate(x => math.max(x, t.taskInfo.duration))
          nTasks.incrementAndGet()
          val spill = m.map(x => x.memoryBytesSpilled + x.diskBytesSpilled).getOrElse(0L)
          val recs = m.map(_.shuffleReadMetrics.recordsRead).getOrElse(0L)
          // keep the records-read OF the longest task (not independent
          // maxima — they can come from different tasks and mislead)
          stages.merge(t.stageId,
            (t.taskInfo.duration, 1L, shuffleRead, spill, recs),
            (a, b) => (math.max(a._1, b._1), a._2 + b._2,
              math.max(a._3, b._3), a._4 + b._4,
              if (b._1 > a._1) b._5 else a._5))
        }
      }
    }

    def agg(joined: DataFrame): DataFrame = joined
      .groupBy("s_nationkey")
      .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("sum_qty"),
        count(lit(1)).as("n_items"))

    def run(name: String)(build: () => DataFrame):
        (String, Double, Double, Long, Long, String) = {
      maxTaskMs.set(0); nTasks.set(0); stages.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val rows = build().orderBy("s_nationkey").collect()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      // checksum over the full result — strategies must agree exactly
      val sum = rows.map(r => r.getLong(2) * (r.getInt(0) + 7)).sum
      import scala.jdk.CollectionConverters._
      val st = stages.asScala.toSeq.sortBy(_._1).map {
        case (id, (mt, n, rd, sp, recs)) =>
          s"""{"max_task_sec":${mt / 1e3},"tasks":$n,""" +
            s""""max_read_mb":${rd / 1048576.0},"spill_mb":${sp / 1048576.0},""" +
            s""""slowest_task_records":$recs}"""
      }.mkString("[", ",", "]")
      (name, sec, maxTaskMs.get() / 1e3, nTasks.get(), sum, st)
    }

    def withConf(kvs: (String, String)*)(
        body: => (String, Double, Double, Long, Long, String)) = {
      val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally olds.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    // warm pass: page-cache the inputs and JIT the join pipeline so
    // the first timed strategy doesn't pay cold costs alone
    agg(big.join(sup, Seq("suppkey"))).collect()

    val naive = withConf("spark.sql.adaptive.skewJoin.enabled" -> "false") {
      run("naive")(() => agg(big.join(sup, Seq("suppkey"))))
    }
    val aqe = withConf(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4m",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2") {
      run("aqe")(() => agg(big.join(sup, Seq("suppkey"))))
    }
    val salted = withConf("spark.sql.adaptive.skewJoin.enabled" -> "false") {
      run("salted")(() =>
        agg(Skew.saltedJoin(big, sup, "suppkey", col("l_orderkey"), nSalts)))
    }
    // the packed single-column form: identical balance, radix-sorts
    // through the tied key prefix the pair form pays a record
    // comparator for (see Skew.saltedJoinPacked scaladoc)
    val salted1 = withConf("spark.sql.adaptive.skewJoin.enabled" -> "false") {
      run("salted_packed")(() =>
        agg(Skew.saltedJoinPacked(big, sup, "suppkey", col("l_orderkey"), nSalts)))
    }

    val all = Seq(naive, aqe, salted, salted1)
    require(all.map(_._5).distinct.size == 1,
      s"strategies disagree: ${all.map(r => r._1 -> r._5)}")

    val per = all.map { case (n, sec, mt, tasks, _, st) =>
      s""""$n":{"sec":$sec,"max_task_sec":$mt,"tasks":$tasks,"stages":$st}"""
    }.mkString(",")
    val line = s"""{"metric":"skew_join","sf":"$dir","hot_pct":$hotPct,""" +
      s""""n_salts":$nSalts,"hot_rows":${big.filter(col("suppkey") === hot).count()},""" +
      s""""results_agree":true,$per,"probe":$probe,""" +
      s""""load":"${Bench.loadavg()}","cpus":$cpus}"""
    println(line)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { f =>
      java.nio.file.Files.write(java.nio.file.Paths.get(f),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
