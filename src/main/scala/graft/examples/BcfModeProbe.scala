package graft.examples

import org.apache.spark.sql.SparkSession

import graft.GraftSession
import graft.sources.{BcfIO, Vcf}

/** bcf_cohort_full bimodality probe (SURVEY §6.r15 watch item): the
  * FORMATBENCH phase runs ~9-12k rec/s modally with occasional whole
  * runs at ~49k, and min-of-3 WITHIN a run does not collapse it — so
  * the cause is run-level (JIT compilation or host scheduling), not
  * transient contention.  This main separates the two hypotheses:
  * ONE fixture build, then `reps` back-to-back full cohort reads in
  * the SAME JVM, each stamped with its wall time, the JVM's total
  * JIT compilation-time delta (CompilationMXBean) and GC delta.
  *
  *   - JIT hypothesis: early reps slow, late reps fast, compilation
  *     time accumulating across exactly the slow reps — every JVM
  *     eventually reaches the fast mode.
  *   - Scheduling/layout hypothesis: a JVM is uniformly fast or slow
  *     across all reps regardless of compilation activity; mode only
  *     changes between JVMs.
  *
  * Run 2-3 fresh JVMs of this and read the per-rep series.  One JSON
  * line to stdout and SPARK_GRAFT_BENCH_OUT (append-safe sidecar
  * discipline does not apply: this artifact is single-purpose). */
object BcfModeProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000000
    val reps = if (args.length > 1) args(1).toInt else 8
    val dir = if (args.length > 2) args(2) else "/tmp/graft_bcf_mode"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the FORMATBENCH cohort fixture, verbatim sizing (nSam=500,
    // nSite=n/100): genotype matrix dominates the bytes
    val nSam = 500
    val nSite = n / 100
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val vcfFile = s"$dir/bench_cohort.vcf"
    val gtNames = (0 until nSam).map(i => s"s$i")
    val vcfHeader = Seq(
      "##fileformat=VCFv4.3",
      "##INFO=<ID=DP,Number=1,Type=Integer,Description=\"d\">",
      "##FORMAT=<ID=GT,Number=1,Type=String,Description=\"g\">",
      "##FORMAT=<ID=DP,Number=1,Type=Integer,Description=\"d\">",
      "##contig=<ID=chr1,length=200000000>",
      "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT" +
        gtNames.map("\t" + _).mkString)
    locally {
      val w = new java.io.BufferedWriter(new java.io.FileWriter(vcfFile), 1 << 20)
      vcfHeader.foreach { l => w.write(l); w.write('\n') }
      var i = 0
      while (i < nSite) {
        w.write(s"chr1\t${100 + i * 37}\tv$i\tA\tG\t50\tPASS\tDP=${i % 90}\tGT:DP")
        var s2 = 0
        while (s2 < nSam) { w.write(s"\t${s2 % 2}/${(s2 + i) % 2}:${s2 % 60}"); s2 += 1 }
        w.write('\n')
        i += 1
      }
      w.close()
    }
    val vlen = java.nio.file.Files.size(java.nio.file.Paths.get(vcfFile))
    val vsplit = math.max(1L << 20, vlen / (cpus * 2))
    val bcfFile = s"$dir/bench_cohort.bcf"
    val dicts = BcfIO.Dicts(Array("chr1"), Array("PASS"), Array("DP"),
      Array("GT", "DP"))
    BcfIO.write(Vcf.read(spark, vcfFile, splitSize = vsplit)
      .repartition(1).sortWithinPartitions("pos"), dicts, bcfFile)

    // optional pollution pre-phase (arg 3 = "vcffull"): run the VCF
    // cohort FULL reads first, as FormatBench does — the r16 follow-up
    // experiment after bcf_cohort_full_warm came out 1.00x in the
    // long-lived FormatBench JVM while fresh JVMs converge to ~40k:
    // if the BCF reps drop to the slow mode only WITH this pre-phase,
    // the mode is JIT type-profile pollution from the text-VCF decode
    // training shared call sites megamorphic, not warm-up.
    val pollute = args.length > 3 && args(3) == "vcffull"
    if (pollute) {
      var i = 0
      while (i < 3) {
        require(Vcf.read(spark, vcfFile, splitSize = vsplit).count() == nSite.toLong)
        i += 1
      }
      println("BCFMODE pre-phase: 3x vcf_cohort_full read done")
    }

    def jitMs(): Long = {
      val b = java.lang.management.ManagementFactory.getCompilationMXBean
      if (b != null && b.isCompilationTimeMonitoringSupported)
        b.getTotalCompilationTime else -1L
    }
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }

    val rows = (0 until reps).map { r =>
      val j0 = jitMs(); val g0 = gcMs()
      val t0 = System.nanoTime()
      val c = BcfIO.read(spark, bcfFile).count()
      val sec = (System.nanoTime() - t0) / 1e9
      require(c == nSite.toLong, s"read $c of $nSite")
      val row = (r, sec, nSite / sec, jitMs() - j0, gcMs() - g0)
      println(f"BCFMODE rep $r%2d ${sec}%7.2fs ${nSite / sec / 1000}%7.1fk rec/s " +
        f"jit_delta=${row._4}%dms gc_delta=${row._5}%dms")
      row
    }
    val repsJson = rows.map { case (r, sec, rate, jit, gc) =>
      s"""{"rep":$r,"sec":$sec,"rec_per_sec":$rate,"jit_delta_ms":$jit,"gc_delta_ms":$gc}"""
    }.mkString("[", ",", "]")
    val json = s"""{"metric":"bcf_cohort_full_mode_probe","n_site":$nSite,""" +
      s""""n_sam":$nSam,"pre_phase":"${if (pollute) "vcffull" else "none"}",""" +
      s""""reps":$repsJson,""" +
      s""""git_sha":"${graft.Bench.gitSha()}","cpus":$cpus}"""
    println(json)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { out =>
      // append: the runner concatenates several JVMs into one artifact
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
    spark.stop()
  }
}
