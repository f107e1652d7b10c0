package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line.  Failed queries are
  * reported as -1 sec plus an entry in "errors" — never folded into
  * timings (VERDICT r1).
  */
object Bench {
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

    // Warm the JVM/codegen once so per-query numbers measure the query,
    // not first-use classloading.
    SparkEntry.queries.get("q1_agg").foreach { fn =>
      try { fn(spark, sfDir).count(); () } catch { case _: Throwable => () }
    }

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // Two timed runs per query; "queries" reports the min (steady
    // state — what plan quality determines at 100 TB), "cold" the
    // first run, which additionally pays that query's whole-stage
    // codegen + JIT compilation (measured 0.5-2s per query, pure
    // JVM warm-up noise that swamps sub-second queries).
    // optional args = subset of query names (targeted A/B timing);
    // the driver passes none and benches everything
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (k, _) => args.contains(k) }
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
        val warm = once()
        name -> (math.min(cold, warm), cold)
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          spark.catalog.clearCache()
          name -> (-1.0, -1.0)
      }
    }
    val qs = results.map { case (k, (v, _)) => s""""${esc(k)}":$v""" }
      .mkString("{", ",", "}")
    val cs = results.map { case (k, (_, c)) => s""""${esc(k)}":$c""" }
      .mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, (v, _)) if v >= 0 => v }.sum
    val coldTotal = results.collect { case (_, (_, c)) if c >= 0 => c }.sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cold":$cs,"cold_total":$coldTotal,"errors":$es,"sf":"${esc(sfDir)}"}"""
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
