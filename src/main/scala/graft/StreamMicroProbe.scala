package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamAudioEnergy
import graft.streaming.StreamAudioEnergy.AudioEvent

/** Micro-batch regime probe for the streaming audio operator (VERDICT
  * r14 item 8): STREAMBENCH_r14 measured stream_audio at 271 rows/s in
  * the micro16 regime vs 6.2k bulk, but the artifact cannot say WHY —
  * fixed per-batch planning/commit overhead at 147-row batches, or
  * per-batch decoder re-initialization.
  *
  * Method: fixed total rows, sweep the batch count (1/4/16/64), and
  * run each point through TWO pipelines fed identically:
  *   - `audio`: the real operator — WAV payload decode through the SPI
  *     readers + framed energy + windowed audit (exactly the
  *     STREAMBENCH case);
  *   - `control`: the SAME rows, SAME windowed aggregation, but the
  *     per-row work is a trivial payload-length checksum — no decoder
  *     anywhere in the plan.
  * The per-batch marginal cost of each pipeline comes from a least-
  * squares fit sec ≈ fixed + perBatch·batches over the sweep.  If the
  * decoder were re-initialized per batch, `audio`'s per-batch cost
  * would exceed `control`'s by the re-init cost; matching slopes mean
  * the gap is engine-side planning/commit overhead, invariant to what
  * the batch computes.
  */
object StreamMicroProbe {

  private def driveOnce[A](spark: SparkSession, data: Seq[A], movers: Seq[A],
                           nBatches: Int, build: Dataset[A] => DataFrame)(
                           implicit enc: org.apache.spark.sql.Encoder[A])
      : (Double, Int) = {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("smp").toString
    try {
      val mem = MemoryStream[A]
      val query = build(mem.toDS()).writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("append").queryName("smp").start()
      try {
        val slice = math.max(1, (data.size + nBatches - 1) / nBatches)
        val t0 = System.nanoTime()
        data.grouped(slice).foreach { b =>
          mem.addData(b: _*)
          query.processAllAvailable()
        }
        mem.addData(movers: _*)
        query.processAllAvailable()
        ((System.nanoTime() - t0) / 1e9, query.recentProgress.length)
      } finally query.stop()
    } finally {
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt)).iterator().asScala
          .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Throwable => () }
    }
  }

  /** Least-squares fit y ≈ a + b·x; returns (a, b). */
  private[graft] def fit(xs: Seq[Double], ys: Seq[Double]): (Double, Double) = {
    val n = xs.length.toDouble
    val mx = xs.sum / n
    val my = ys.sum / n
    val b = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum /
      math.max(1e-12, xs.map(x => (x - mx) * (x - mx)).sum)
    (my - b * mx, b)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val sweep = sys.env.getOrElse("SPARK_GRAFT_MICRO_SWEEP", "1,4,16,64")
      .split(",").map(_.trim.toInt).toSeq
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
      (sweep.max + 8).toString)
    import spark.implicits._

    val loadStart = Bench.loadavg()
    val probeStart = Bench.calibrate()

    // the STREAMBENCH stream_audio corpus, verbatim: 1 doc/s event time
    val base = 1700000000000000L
    val rows = graft.Tables.documents(spark, sfDir)
      .orderBy("doc_id").select("doc_id").as[Long].collect().zipWithIndex
      .map { case (id, i) =>
        val n = (id % 1500 + 200).toInt
        AudioEvent(id,
          graft.queries.Audio.buildWav((8000 + (id % 3) * 4000).toInt,
            Array.tabulate(n)(j => graft.queries.Audio.sampleFormula(j, id))),
          base + i * 1000000L)
      }.toSeq
    val farTs = rows.last.ts_us + 1000L * 60L * 1000000L
    val mover = Seq(AudioEvent(999999918L,
      graft.queries.Audio.buildWav(8000, Array(0)), farTs))

    def audioOp(ds: Dataset[AudioEvent]): DataFrame =
      StreamAudioEnergy.audit(ds, "10 minutes")
    // identical rows + windowed agg, NO decoder in the plan: per-row
    // work is a payload-length sum, the cheapest stand-in
    def controlOp(ds: Dataset[AudioEvent]): DataFrame =
      ds.map(a => (a.doc_id, a.payload.length.toLong, a.ts_us))
        .toDF("doc_id", "n_bytes", "ts_us")
        .withColumn("ts", expr("timestamp_micros(ts_us)"))
        .withWatermark("ts", "0 seconds")
        .groupBy(window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("n_clips"), sum(col("n_bytes")).as("sum_bytes"))
        .select(unix_micros(col("window.start")).as("window_start_us"),
          col("n_clips"), col("sum_bytes"))

    // warm both plans once (codegen/JIT out of the measured points)
    driveOnce(spark, rows.take(64), mover, 1, audioOp)
    driveOnce(spark, rows.take(64), mover, 1, controlOp)

    final case class Pt(op: String, nBatches: Int, sec: Double, batches: Int)
    val pts = sweep.flatMap { nb =>
      val (sa, ba) = driveOnce(spark, rows, mover, nb, audioOp)
      val (sc, bc) = driveOnce(spark, rows, mover, nb, controlOp)
      Seq(Pt("audio", nb, sa, ba), Pt("control", nb, sc, bc))
    }
    val probeEnd = Bench.calibrate()
    val loadEnd = Bench.loadavg()

    def fitOf(op: String): (Double, Double) = {
      val ps = pts.filter(_.op == op)
      fit(ps.map(_.batches.toDouble), ps.map(_.sec))
    }
    val (aFix, aPer) = fitOf("audio")
    val (cFix, cPer) = fitOf("control")
    val verdict =
      if (aPer < 1.5 * cPer)
        "per-batch cost matches the decoder-free control: the micro-batch gap " +
          "is engine planning/commit overhead, not decoder re-init"
      else
        "per-batch cost exceeds the decoder-free control: decode-side " +
          "per-batch work present"

    val ptJson = pts.map(p =>
      s"""{"op":"${p.op}","n_batches":${p.nBatches},"sec":${p.sec},""" +
        s""""batches_observed":${p.batches},""" +
        s""""rows_per_sec":${rows.size / math.max(1e-9, p.sec)}}""")
      .mkString("[", ",", "]")
    val json = s"""{"metric":"stream_micro_probe","rows":${rows.size},""" +
      s""""sweep":${sweep.mkString("[", ",", "]")},"points":$ptJson,""" +
      s""""fit":{"audio_fixed_sec":$aFix,"audio_per_batch_sec":$aPer,""" +
      s""""control_fixed_sec":$cFix,"control_per_batch_sec":$cPer},""" +
      s""""verdict":"$verdict",""" +
      s""""env":{"load_start":"$loadStart","load_end":"$loadEnd",""" +
      s""""probe_start_sec":$probeStart,"probe_end_sec":$probeEnd,""" +
      s""""cpus":$cpus,"git_sha":"${Bench.gitSha()}"},"sf":"$sfDir"}"""
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "streammicroprobe_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"probe write failed: ${e.getMessage}") }
    spark.stop()
  }
}
