package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measured evidence for the P69 scaladoc claim (CorpusStats.dupSpans):
  * the duplicated-position mark can be spelled two ways, and the
  * shipped choice is about the HOT-SHINGLE regime, not the balanced one.
  *
  *   - `join`:     df hash-agg (map-side partials) + left-semi back
  *     onto the stream, default strategy (SMJ — which SORTS the
  *     stream side; on a hot key that is millions of tied strings
  *     in one task).
  *   - `join_shj`: the SHIPPED form — same join, `shuffle_hash`
  *     hinted: the right side carries ≤1 row per shingle, so the
  *     hash build is the distinct dup set and the stream side is
  *     never sorted at all.
  *   - `window`:   `COUNT(*) OVER (PARTITION BY s)` — one exchange,
  *     one scan, but WindowExec pays the same per-partition sort AND
  *     must BUFFER every occurrence of a group before emitting it: a
  *     boilerplate shingle (license header, navigation chrome — what
  *     a 100 TB web corpus is full of) puts its entire occurrence
  *     list in ONE task's buffer.
  *
  * Two regimes, same machinery as SkewProbe (max shuffle-read task =
  * the 1000-executor critical path; spill bytes = the buffering
  * signal; checksums asserted identical across strategies):
  *
  *   - `corpus`: the real sf documents — balanced dfs, no hot key.
  *     Before the graft_word_shingles kernel the window's one-scan
  *     advantage showed here (the HOF shingle spelling made the
  *     second scan expensive); with the kernel the hinted SHJ wins
  *     this regime too, on wall and critical path both.
  *   - `hot`:    a synthetic stream (nRows, hotPct% of positions
  *     carrying ONE shingle value) modeling the boilerplate regime
  *     the probe exists for.
  *
  * Broadcast is disabled throughout: at probe scale the ≤1-row-per-
  * key dup set broadcasts and the join side never shuffles — real at
  * sf, meaningless at 100 TB where distinct duplicated shingles are
  * corpus-sized.  The advisory partition size is pinned small for the
  * same reason as SkewProbe (AQE coalescing at probe scale would
  * merge the geometry the probe measures).
  *
  * Usage: SPARK_GRAFT_CPUS=32 [SPARK_GRAFT_BENCH_OUT=...] \
  *          runMain graft.DupSubstrProbe <sfDir> [nRows] [hotPct]
  */
object DupSubstrProbe {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DupSubstrProbe <sfDir> [nRows] [hotPct]")
    val dir = args(0)
    val nRows = if (args.length > 1) args(1).toLong else 12000000L
    val hotPct = if (args.length > 2) args(2).toInt else 50
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val probe = Bench.calibrate(25000000)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")

    val maxTaskMs = new AtomicLong(0)
    val spillBytes = new AtomicLong(0)
    val slowRecs = new AtomicLong(0)
    val lock = new Object
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = Option(t.taskMetrics)
        val shuffleRead = m.map(_.shuffleReadMetrics.totalBytesRead).getOrElse(0L)
        if (shuffleRead > 0) {
          val recs = m.map(_.shuffleReadMetrics.recordsRead).getOrElse(0L)
          // keep the records OF the longest task, not independent maxima
          lock.synchronized {
            if (t.taskInfo.duration > maxTaskMs.get()) {
              maxTaskMs.set(t.taskInfo.duration); slowRecs.set(recs)
            }
          }
          spillBytes.addAndGet(
            m.map(x => x.memoryBytesSpilled + x.diskBytesSpilled).getOrElse(0L))
        }
      }
    }

    def joinForm(sh: DataFrame): DataFrame = {
      val dup = sh.groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2)
      sh.join(dup.select("s"), Seq("s"), "left_semi").select("doc_id", "pos")
    }
    // same join, SHJ-hinted: the right side is ≤1 row per key, so the
    // hash build is the distinct dup set and the 25M-row hot stream is
    // never SORTED at all — SMJ's stream-side sort is pure waste here
    def joinShjForm(sh: DataFrame): DataFrame = {
      val dup = sh.groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2)
      sh.join(dup.select("s").hint("shuffle_hash"), Seq("s"), "left_semi")
        .select("doc_id", "pos")
    }
    def windowForm(sh: DataFrame): DataFrame = sh
      .withColumn("df", count(lit(1)).over(Window.partitionBy("s")))
      .filter(col("df") >= 2).select("doc_id", "pos")

    // checksum forces full evaluation and pins strategy equivalence
    def run(name: String, marked: DataFrame): (String, Double, Double, Long, Double, (Long, Long)) = {
      maxTaskMs.set(0); spillBytes.set(0); slowRecs.set(0)
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val row = marked
        .agg(count(lit(1)).as("n"),
          sum(col("doc_id") * 31 + col("pos")).as("ck"))
        .collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      val ck = (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1))
      (name, sec, maxTaskMs.get() / 1e3, slowRecs.get(),
        spillBytes.get() / 1048576.0, ck)
    }

    // ---- regime 1: the real corpus (balanced dfs) -------------------
    val corpusSh = graft.queries.CorpusStats.shingleStream(spark, dir)
    // ---- regime 2: synthetic hot-shingle stream ---------------------
    // hotPct% of positions carry ONE 5-token boilerplate shingle; the
    // rest are unique (df = 1, dropped by both strategies).
    val perDoc = 55L
    val hotSh = spark.range(nRows)
      .select(expr(s"id DIV $perDoc").as("doc_id"),
        pmod(col("id"), lit(perDoc)).as("pos"),
        when(pmod(hash(col("id")), lit(100)) < lit(hotPct),
          lit("all rights reserved terms apply"))
          .otherwise(concat(lit("u"), col("id"))).as("s"))

    // warm: page-cache inputs, JIT both pipelines
    run("warm_j", joinForm(corpusSh)); run("warm_w", windowForm(corpusSh))

    // interleaved A/B, two rounds each, keep per-strategy MIN wall
    // (same-window pairing is the whole point of the interleave)
    val rounds = Seq(
      run("corpus_join", joinForm(corpusSh)),
      run("corpus_join_shj", joinShjForm(corpusSh)),
      run("corpus_window", windowForm(corpusSh)),
      run("hot_join", joinForm(hotSh)),
      run("hot_join_shj", joinShjForm(hotSh)),
      run("hot_window", windowForm(hotSh)),
      run("corpus_join", joinForm(corpusSh)),
      run("corpus_join_shj", joinShjForm(corpusSh)),
      run("corpus_window", windowForm(corpusSh)),
      run("hot_join", joinForm(hotSh)),
      run("hot_join_shj", joinShjForm(hotSh)),
      run("hot_window", windowForm(hotSh)))

    for (regime <- Seq("corpus", "hot")) {
      val cks = rounds.filter(_._1.startsWith(regime)).map(_._6).distinct
      require(cks.size == 1, s"$regime strategies disagree: $cks")
    }

    val per = rounds.groupBy(_._1).toSeq.sortBy(_._1).map { case (name, rs) =>
      val best = rs.minBy(_._2)
      s""""$name":{"sec":${best._2},"max_task_sec":${best._3},""" +
        s""""slowest_task_records":${best._4},"spill_mb":${best._5},""" +
        s""""marked_rows":${best._6._1}}"""
    }.mkString(",")
    val line = s"""{"metric":"dup_substr_mark","sf":"$dir","n_rows":$nRows,""" +
      s""""hot_pct":$hotPct,"results_agree":true,$per,"probe":$probe,""" +
      s""""load":"${Bench.loadavg()}","cpus":$cpus}"""
    println(line)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { f =>
      java.nio.file.Files.write(java.nio.file.Paths.get(f),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
