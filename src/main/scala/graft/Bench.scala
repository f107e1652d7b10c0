package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line.  Failed queries are
  * reported as -1 sec plus an entry in "errors" — never folded into
  * timings (VERDICT r1).
  *
  * The artifact is self-diagnosing (VERDICT r7): BENCH_r07.json
  * reported a 2.6× phantom regression caused purely by a contended
  * driver sandbox, and only an out-of-band re-run disproved it.  Now
  * every run carries the evidence needed to trust or discount it:
  *   - three timed runs per query; "queries" is the MEDIAN (one
  *     contention spike cannot move it), "min" the best observed,
  *     "cold" the first run (codegen + JIT included);
  *   - a fixed-work single-thread CPU calibration probe timed at
  *     start and end — on an idle machine the two agree and sit near
  *     the same value round over round, so a loaded machine shows up
  *     as probe inflation inside the artifact itself;
  *   - /proc/loadavg before/after and JVM GC totals;
  *   - "suspect": true + reasons when warm>cold on >10% of queries,
  *     the probes disagree by >25%, or starting loadavg already
  *     exceeds the core count.
  */
object Bench {

  /** Fixed-work CPU probe: ~200M xorshift steps, single thread.  The
    * work is constant, so the wall time ratio between two probes is a
    * direct read of how much CPU the sandbox actually gave us. */
  private def calibrate(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < 200000000) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      i += 1
    }
    if (x == 42) println("") // defeat dead-code elimination
    (System.nanoTime() - t0) / 1e9
  }

  private def loadavg(): String =
    try {
      val s = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
      s.split("\\s+").take(3).mkString(" ")
    } catch { case _: Throwable => "" }

  private def load1(s: String): Double =
    try s.split("\\s+")(0).toDouble catch { case _: Throwable => -1.0 }

  private def gcTotals(): (Long, Long) = {
    import scala.jdk.CollectionConverters._
    val beans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
    (beans.map(_.getCollectionCount).sum, beans.map(_.getCollectionTime).sum)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

    val loadStart = loadavg()
    val probeStart = calibrate()

    // Warm the JVM/codegen once so per-query numbers measure the query,
    // not first-use classloading.
    SparkEntry.queries.get("q1_agg").foreach { fn =>
      try { fn(spark, sfDir).count(); () } catch { case _: Throwable => () }
    }

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // optional args = subset of query names (targeted A/B timing);
    // the driver passes none and benches everything
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (k, _) => args.contains(k) }
    // (name, median, min, cold, warmMin) per query
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        // noop sink, not count(): count() lets Catalyst ELIMINATE work
        // the query claims to do — final sorts (EliminateSorts) and
        // whole pipelines behind outer joins of small scaffolds get
        // pruned, reporting fiction (q_threshold_sweep measured 40×
        // faster than the minhash pipeline it contains).  The noop
        // write materializes every column of every row.
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        // iterative queries persist intermediates; drop them so later
        // runs are measured against a clean executor memory state
        spark.catalog.clearCache()
        t
      }
      try {
        val cold = once()
        val w1 = once()
        val w2 = once()
        val sorted = Seq(cold, w1, w2).sorted
        (name, sorted(1), sorted(0), cold, math.min(w1, w2))
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          spark.catalog.clearCache()
          (name, -1.0, -1.0, -1.0, -1.0)
      }
    }

    val probeEnd = calibrate()
    val loadEnd = loadavg()
    val (gcCount, gcMs) = gcTotals()

    // Contention diagnosis: on an idle machine a warm run beats the
    // cold run (which additionally pays codegen+JIT).  warm > cold
    // means something stole the CPU between the runs.
    val ok = results.filter(_._2 >= 0)
    val warmSlower = ok.count { case (_, _, _, cold, warmMin) => warmMin > cold }
    val warmSlowerFrac = if (ok.isEmpty) 0.0 else warmSlower.toDouble / ok.size
    val probeDrift = math.abs(probeEnd - probeStart) / math.max(probeStart, 1e-9)
    val reasons = scala.collection.mutable.ArrayBuffer[String]()
    if (warmSlowerFrac > 0.10)
      reasons += f"warm run slower than cold on $warmSlower/${ok.size} queries (${warmSlowerFrac * 100}%.0f%%)"
    if (probeDrift > 0.25)
      reasons += f"CPU calibration probe drifted ${probeDrift * 100}%.0f%% ($probeStart%.2fs -> $probeEnd%.2fs)"
    if (load1(loadStart) > cpus)
      reasons += s"loadavg already ${load1(loadStart)} at start with $cpus cores"
    val suspect = reasons.nonEmpty

    def jmap(f: ((String, Double, Double, Double, Double)) => Double): String =
      results.map(r => s""""${esc(r._1)}":${f(r)}""").mkString("{", ",", "}")
    val qs = jmap(_._2)
    val mins = jmap(_._3)
    val cs = jmap(_._4)
    val es = errors.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}")
    def tot(f: ((String, Double, Double, Double, Double)) => Double): Double =
      results.map(f).filter(_ >= 0).sum
    val total = tot(_._2)
    val minTotal = tot(_._3)
    val coldTotal = tot(_._4)
    val env = s"""{"load_start":"${esc(loadStart)}","load_end":"${esc(loadEnd)}",""" +
      s""""probe_start_sec":$probeStart,"probe_end_sec":$probeEnd,""" +
      s""""gc_count":$gcCount,"gc_ms":$gcMs,"cpus":$cpus,""" +
      s""""runs_per_query":3}"""
    val rs = reasons.map(r => s""""${esc(r)}"""").mkString("[", ",", "]")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""min":$mins,"min_total":$minTotal,"cold":$cs,"cold_total":$coldTotal,""" +
      s""""suspect":$suspect,"suspect_reasons":$rs,"env":$env,""" +
      s""""errors":$es,"sf":"${esc(sfDir)}"}"""
    println(json)
    // Also persist to a file: the driver captures only a truncated
    // stdout tail, so every BENCH_r*.json through r6 carried
    // "parsed": null with the steady map lost (VERDICT r6 item 2).
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"bench_out write failed: ${e.getMessage}") }
    spark.stop()
  }
}
