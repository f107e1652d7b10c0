package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured scale evidence for the tie-aware ranked limit pushdown
  * (VERDICT r13 item 5): the rule's claim — "band population never
  * rides the shuffle" — was proven by plan pin but only measured as
  * wall time.  This probe runs the two gated consumers with
  * `spark.graft.ranked.limitPushdown` ON vs OFF on the SAME jar in ONE
  * window (ABBA-interleaved), recording SHUFFLE BYTES/RECORDS — the
  * 1000-executor network metric — alongside wall seconds, with result
  * checksums asserted identical (the pushdown must change nothing but
  * where rows die).
  *
  *   - `q_leaderboard`: rank() bound (KeepTies) on a chained
  *     rank+dense_rank pair riding one range exchange.
  *   - `q_top_bands`: dense_rank() bound (KeepDistinctTies) — the
  *     band-identity pruner.
  *   - `q_pack_sequences`: keyless control — no group-limit filter, so
  *     the flag must not move it (any delta is window noise, which
  *     calibrates how to read the other rows).
  *
  * Usage: SPARK_GRAFT_CPUS=32 [SPARK_GRAFT_BENCH_OUT=...] \
  *          runMain graft.RankedLimitProbe <sfDir> [reps]
  */
object RankedLimitProbe {

  final case class M(sec: Double, readMb: Double, readRecs: Long,
                     maxTaskReadMb: Double, chk: Long, rows: Long)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RankedLimitProbe <sfDir> [reps]")
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val probeSec = Bench.calibrate(25000000)

    val readBytes = new AtomicLong(0)
    val readRecs = new AtomicLong(0)
    val maxTaskRead = new AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        Option(t.taskMetrics).foreach { m =>
          val rd = m.shuffleReadMetrics.totalBytesRead
          if (rd > 0) {
            readBytes.addAndGet(rd)
            readRecs.addAndGet(m.shuffleReadMetrics.recordsRead)
            maxTaskRead.getAndUpdate(x => math.max(x, rd))
          }
        }
      }
    }

    def timed(build: () => DataFrame): M = {
      readBytes.set(0); readRecs.set(0); maxTaskRead.set(0)
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val df = build()
      // checksum EVERY column of EVERY row: ON and OFF must agree
      // bit-for-bit.  (The final cosmetic orderBy is eliminated under
      // the agg — identically for both flags — so the measured work is
      // the ranked pipeline itself.)
      val row = df.agg(
        // per-row hash bounded to ±1e9 so the ANSI sum cannot overflow
        sum(xxhash64(df.columns.map(col).toSeq: _*) % lit(1000000007L)).as("chk"),
        count(lit(1)).as("n")).collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain task-end events
      spark.sparkContext.removeSparkListener(listener)
      M(sec, readBytes.get / 1048576.0, readRecs.get,
        maxTaskRead.get / 1048576.0, row.getLong(0), row.getLong(1))
    }

    def withFlag[T](on: Boolean)(body: => T): T = {
      spark.conf.set("spark.graft.ranked.limitPushdown", on.toString)
      try body finally spark.conf.unset("spark.graft.ranked.limitPushdown")
    }

    import graft.queries.{Analytics, Packing}
    val shapes: Seq[(String, () => DataFrame)] = Seq(
      ("q_leaderboard", () => Analytics.qLeaderboard(spark, dir)),
      ("q_top_bands", () => Analytics.qTopBands(spark, dir)),
      ("q_pack_sequences", () => Packing.queries("q_pack_sequences")(spark, dir)))

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def medL(xs: Seq[Long]): Long = xs.sorted.apply(xs.size / 2)

    val results = shapes.map { case (name, build) =>
      // warm both paths (JIT, codegen, page cache), then ABBA-interleave
      withFlag(true)(timed(build)); withFlag(false)(timed(build))
      val pairs = (0 until reps).map { i =>
        if (i % 2 == 0) (withFlag(true)(timed(build)), withFlag(false)(timed(build)))
        else { val off = withFlag(false)(timed(build)); (withFlag(true)(timed(build)), off) }
      }
      val on = pairs.map(_._1)
      val off = pairs.map(_._2)
      require((on ++ off).map(r => (r.chk, r.rows)).distinct.size == 1,
        s"$name: pushdown ON/OFF results disagree")
      println(f"RANKEDLIMITPROBE $name%-18s on=${med(on.map(_.sec))}%6.2fs " +
        f"off=${med(off.map(_.sec))}%6.2fs readMB on=${med(on.map(_.readMb))}%9.1f " +
        f"off=${med(off.map(_.readMb))}%9.1f")
      s""""$name":{"on_sec":${med(on.map(_.sec))},"off_sec":${med(off.map(_.sec))},""" +
        s""""on_shuffle_read_mb":${med(on.map(_.readMb))},""" +
        s""""off_shuffle_read_mb":${med(off.map(_.readMb))},""" +
        s""""on_shuffle_read_records":${medL(on.map(_.readRecs))},""" +
        s""""off_shuffle_read_records":${medL(off.map(_.readRecs))},""" +
        s""""on_max_task_read_mb":${med(on.map(_.maxTaskReadMb))},""" +
        s""""off_max_task_read_mb":${med(off.map(_.maxTaskReadMb))},""" +
        s""""rows":${on.head.rows},"results_agree":true}"""
    }

    val json = s"""{"metric":"ranked_limit_pushdown_ab","sf_dir":"$dir",""" +
      s""""reps":$reps,"cpus":$cpus,"probe_sec":$probeSec,""" +
      s""""probe_end_sec":${Bench.calibrate(25000000)},""" +
      s""""queries":{${results.mkString(",")}}}"""
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "rankedlimit_probe.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
