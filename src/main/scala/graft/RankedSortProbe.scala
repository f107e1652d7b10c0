package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Ranked

/** Measured evidence for the packed sort-prefix (plans/PackedSortKey —
  * the SKEWPROBE r12 class note, closed): the ranked range sort orders
  * by `(group, order…)`, and with a low-|k| leading string every
  * within-group prefix comparison ties, so SortExec falls back to the
  * row comparator per comparison.  The packed prefix folds the
  * group's first 4 bytes AND a coarse image of the order key into the
  * one long SortExec compares cheaply.
  *
  * Three shapes, each run packed ON vs OFF (same session, warm):
  *
  *   - `synthetic_window`: 5 langs × N rows, orders uniform in the
  *     packing's ±2^31 fidelity window — the claimed win.
  *   - `synthetic_saturated`: same rows, orders uniform over FULL
  *     64-bit range, so ~half the images saturate at each window edge
  *     and most comparisons still fall back — measures the overhead
  *     bound honestly (expected ≈ parity).
  *   - `q_median_group`: the real gated query at the probe sf
  *     (l_returnflag × l_extendedprice DOUBLE order — the sortable-
  *     bits image).
  *
  * Per run: wall seconds and the slowest shuffle-read task (the
  * 1000-executor signal), plus result checksums asserted identical
  * ON vs OFF — the packing must change nothing but comparison cost.
  *
  * Usage: SPARK_GRAFT_CPUS=32 [SPARK_GRAFT_BENCH_OUT=...] \
  *          runMain graft.RankedSortProbe <sfDir> [rows]
  */
object RankedSortProbe {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RankedSortProbe <sfDir> [rows]")
    val dir = args(0)
    val rows = if (args.length > 1) args(1).toLong else 12000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val probe = Bench.calibrate(25000000)
    import spark.implicits._

    val maxTaskMs = new AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val read = Option(t.taskMetrics)
          .map(_.shuffleReadMetrics.totalBytesRead).getOrElse(0L)
        if (read > 0)
          maxTaskMs.getAndUpdate(x => math.max(x, t.taskInfo.duration))
      }
    }

    // synthetic base: deterministic, columnar-generated, cached so the
    // timed region is exchange + sort + ranked passes only
    val langs = array(Seq("en", "fr", "de", "zh", "ja").map(lit): _*)
    val base = spark.range(rows).select(
      element_at(langs, (pmod(col("id") * 2654435761L, lit(5)) + 1).cast("int")).as("lang"),
      // splitmix-ish deterministic scramble
      expr("hash(id, 42)").cast("long").as("h32"),
      expr("xxhash64(id)").as("h64"),
      col("id"),
      lit(1L).as("one"))
      .withColumn("o_window", col("h32")) // hash() is int32 → values within ±2^31
      .withColumn("o_full", col("h64"))   // full 64-bit range → saturates
      .cache()
    base.count()

    def timed(name: String)(build: () => DataFrame): (Double, Double, Long) = {
      maxTaskMs.set(0)
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val row = build().agg(
        sum(expr("rn * (CAST(crc32(CAST(lang AS BINARY)) AS BIGINT) % 97 + 1)")).as("chk"),
        max("rn").as("mx")).collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      (sec, maxTaskMs.get() / 1e3, row.getLong(0))
    }

    def withFlag[T](on: Boolean)(body: => T): T = {
      spark.conf.set("spark.graft.ranked.packedSortPrefix", on.toString)
      try body finally spark.conf.unset("spark.graft.ranked.packedSortPrefix")
    }

    def ab(name: String, runs: Int)(build: () => DataFrame): String = {
      // warm both paths once (JIT + page cache), then INTERLEAVE the
      // timed runs (on, off, on, off…) so ambient load drift cannot
      // systematically penalize one flag, and keep per-flag medians
      withFlag(true)(timed(name)(build)); withFlag(false)(timed(name)(build))
      val pairs = (1 to runs).map { _ =>
        (withFlag(true)(timed(name)(build)), withFlag(false)(timed(name)(build)))
      }
      val on = pairs.map(_._1)
      val off = pairs.map(_._2)
      require(on.map(_._3).distinct.size == 1 &&
        on.map(_._3).head == off.map(_._3).head,
        s"$name: packed ON/OFF results disagree")
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      s""""$name":{"packed_sec":${med(on.map(_._1))},""" +
        s""""plain_sec":${med(off.map(_._1))},""" +
        s""""packed_max_task_sec":${med(on.map(_._2))},""" +
        s""""plain_max_task_sec":${med(off.map(_._2))},""" +
        s""""results_agree":true}"""
    }

    val winShape = () => Ranked.prefixSum(
      base.select("lang", "o_window", "id", "one"),
      Seq("lang"), Seq("o_window", "id"), "one", "rn")
    val fullShape = () => Ranked.prefixSum(
      base.select("lang", "o_full", "id", "one"),
      Seq("lang"), Seq("o_full", "id"), "one", "rn")

    val parts = Seq(
      ab("synthetic_window", 3)(winShape),
      ab("synthetic_saturated", 3)(fullShape))

    // two real gated queries: q_median_group (double-order
    // sortable-bits image, typed ranked) and q_range_count under
    // autoRewrite (1-char contig group + numeric order — the dual
    // running sums both rewrite to ranked nodes)
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    def realAb(name: String, confs: Map[String, String])(
        run: () => Seq[org.apache.spark.sql.Row], chk: org.apache.spark.sql.Row => Long): String = {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        def one(): (Double, Long) = {
          val t0 = System.nanoTime()
          val rs = run()
          ((System.nanoTime() - t0) / 1e9, rs.map(chk).sum)
        }
        withFlag(true)(one()); withFlag(false)(one())
        val pairs = (1 to 3).map(_ => (withFlag(true)(one()), withFlag(false)(one())))
        val on = pairs.map(_._1)
        val off = pairs.map(_._2)
        require(on.map(_._2).distinct.size == 1 && on.head._2 == off.head._2,
          s"$name ON/OFF results disagree")
        s""""$name":{"packed_sec":${med(on.map(_._1))},""" +
          s""""plain_sec":${med(off.map(_._1))},"results_agree":true}"""
      } finally confs.keys.foreach(spark.conf.unset)
    }
    val qPart = realAb("q_median_group", Map.empty)(
      () => graft.queries.Analytics.qMedianGroup(spark, dir).collect().toSeq,
      r => math.round(r.getDouble(1) * 100) + r.getLong(2))
    val qPart2 = realAb("q_range_count_ranked",
        Map("spark.graft.ranked.autoRewrite" -> "true"))(
      () => graft.queries.Genomic.qRangeCount(spark, dir).collect().toSeq,
      r => r.getLong(1) * (r.getLong(0) % 97 + 1))

    val line = s"""{"metric":"ranked_sort_prefix","sf":"$dir","rows":$rows,""" +
      (parts :+ qPart :+ qPart2).mkString(",") +
      s""","probe":$probe,"load":"${Bench.loadavg()}","cpus":$cpus}"""
    println(line)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { f =>
      java.nio.file.Files.write(java.nio.file.Paths.get(f),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
