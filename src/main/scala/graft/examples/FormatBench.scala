package graft.examples

import org.apache.spark.sql.SparkSession

import graft.GraftSession
import graft.model.{SamHeader, SamRecord, SamRef}
import graft.sources.BamIO

/** Format-layer throughput probe: write N records as a sharded BAM
  * (parallel BGZF deflate + driver merge + splitting index), read them
  * back through the splittable scan, and through a bounded-traversal
  * window.  Prints records/sec per phase — the single-node numbers the
  * 100 TB posture extrapolates from (every phase is embarrassingly
  * parallel across executors; the driver does O(bytes) concat and
  * O(chunks) planning only).
  *
  *   sbt "runMain graft.examples.FormatBench [nRecords] [outDir]"
  */
object FormatBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000000
    val dir = if (args.length > 1) args(1) else "/tmp/graft_format_bench"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val contigLen = 200000000
    val header = SamHeader(
      s"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:$contigLen",
      Array(SamRef("chr1", contigLen)))
    val seq = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"
    val qual = "I" * 60

    // deterministic, pre-sorted by construction (pos strictly grows)
    val ds = spark.range(0, n.toLong, 1, cpus * 4).map { i =>
      SamRecord(s"r$i", if (i % 2 == 0) 99 else 147, "chr1",
        (1L + i * (contigLen - 100).toLong / n).toInt, 60, "60M", "=",
        (1L + i * (contigLen - 100).toLong / n).toInt + 100, 160, seq, qual,
        Array(s"NM:i:${i % 4}"))
    }

    val file = s"$dir/bench.bam"
    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      val t = (System.nanoTime() - t0) / 1e9
      println(f"FORMATBENCH $label%-18s $t%7.2fs  ${n / t / 1e6}%6.2f Mrec/s")
      r
    }

    timed("bam_write")(BamIO.writeSorted(ds, header, file))
    // size splits to the machine: highly repetitive synthetic data
    // compresses ~10×, so the default 64 MB splits under-parallelize
    val len = java.nio.file.Files.size(java.nio.file.Paths.get(file))
    val split = math.max(1L << 20, len / (cpus * 2))
    println(s"FORMATBENCH file_bytes $len split $split")
    val c1 = timed("bam_read")(BamIO.read(spark, file, splitSize = split).count())
    require(c1 == n, s"read $c1 of $n")
    // bounded traversal: middle 1% of the contig via the sidecar index
    val lo = contigLen / 2
    val hi = lo + contigLen / 100
    val c2 = timed("bam_interval_read")(
      BamIO.read(spark, file, intervals = Seq(("chr1", lo, hi))).count())
    println(s"FORMATBENCH interval_rows $c2 (~${100.0 * c2 / n}%)")
    val c3 = timed("bam_dsv2_read")(
      spark.read.format("bam").option("splitsize", split.toString)
        .load(file).where("flag = 99").count())
    require(c3 == (n + 1) / 2, s"dsv2 counted $c3")

    // ---- lazy decode on tag-heavy records (LazyBAMRecordFactory
    // analog): same bytes, full decode vs a (qname, rname, pos) field
    // mask — the mask skips cigar/seq/qual/tag string building at the
    // byte level, which is most of the per-record CPU here
    val nt = n / 4
    val heavy = spark.range(0, nt.toLong, 1, cpus * 4).map { i =>
      SamRecord(s"t$i", 0, "chr1",
        (1L + i * (contigLen - 100).toLong / nt).toInt, 60, "60M", "*", 0, 0,
        seq, qual, Array(
          s"NM:i:${i % 4}", s"AS:i:${(i % 97).toInt}", s"XS:i:${(i % 89).toInt}",
          s"MD:Z:60", s"RG:Z:rg${i % 8}", s"BC:Z:ACGT${i % 13}",
          s"XA:Z:chr1,+${i % 1000},60M,0;", s"SA:Z:chr1,${i % 1000},+,60M,60,0;"))
    }
    val tagFile = s"$dir/bench_tags.bam"
    timed("tagbam_write")(BamIO.writeSorted(heavy, header, tagFile))
    val tlen = java.nio.file.Files.size(java.nio.file.Paths.get(tagFile))
    val tsplit = math.max(1L << 20, tlen / (cpus * 2))
    def readN(label: String, cols: Seq[String]): Double = {
      val t0 = System.nanoTime()
      val c = BamIO.read(spark, tagFile, splitSize = tsplit, columns = cols).count()
      val t = (System.nanoTime() - t0) / 1e9
      require(c == nt, s"$label read $c of $nt")
      println(f"FORMATBENCH $label%-18s $t%7.2fs  ${nt / t / 1e6}%6.2f Mrec/s")
      t
    }
    val tFull = readN("tagbam_full", Nil)
    val tPruned = readN("tagbam_pruned", Seq("qname", "rname", "pos"))
    println(f"FORMATBENCH pruned_speedup ${tFull / tPruned}%.2fx")

    // ---- CRAM, both profiles: graft (BAM-codec payloads, fast path)
    // vs spec (real data-series containers, foreign-readable; reads
    // back through the CramForeign decoder)
    import graft.sources.CramIO
    val cg = s"$dir/bench_graft.cram"
    val cspec = s"$dir/bench_spec.cram"
    val cspec31 = s"$dir/bench_spec31.cram"
    timed("cram_write_graft")(CramIO.write(heavy, header, cg))
    timed("cram_write_spec")(CramIO.write(heavy, header, cspec, profile = "spec"))
    timed("cram_write_spec31")(CramIO.write(heavy, header, cspec31, profile = "spec31"))
    def creadN(label: String, f: String): Unit = {
      val t0 = System.nanoTime()
      val c = CramIO.read(spark, f).count()
      val t = (System.nanoTime() - t0) / 1e9
      require(c == nt, s"$label read $c of $nt")
      println(f"FORMATBENCH $label%-18s $t%7.2fs  ${nt / t / 1e6}%6.2f Mrec/s")
    }
    creadN("cram_read_graft", cg)
    creadN("cram_read_spec", cspec)
    creadN("cram_read_spec31", cspec31)
    println("FORMATBENCH cram_bytes graft=" +
      java.nio.file.Files.size(java.nio.file.Paths.get(cg)) + " spec=" +
      java.nio.file.Files.size(java.nio.file.Paths.get(cspec)) + " spec31=" +
      java.nio.file.Files.size(java.nio.file.Paths.get(cspec31)))

    // ---- lazy VCF/BCF genotype decode (LazyVCFGenotypesContext /
    // LazyBCFGenotypesContext analog): a many-sample cohort file read
    // site-only vs full.  The genotype matrix dominates the bytes, so
    // the site-only read should win big — for BCF it never even reads
    // those bytes off the decompressed stream.
    import graft.model.VcfVariant
    import graft.sources.{BcfIO, Vcf}
    val nSam = 500
    val nSite = n / 100
    val gtNames = (0 until nSam).map(i => s"s$i")
    val vcfFile = s"$dir/bench_cohort.vcf"
    val vcfHeader = Seq(
      "##fileformat=VCFv4.3",
      "##INFO=<ID=DP,Number=1,Type=Integer,Description=\"d\">",
      "##FORMAT=<ID=GT,Number=1,Type=String,Description=\"g\">",
      "##FORMAT=<ID=DP,Number=1,Type=Integer,Description=\"d\">",
      "##contig=<ID=chr1,length=200000000>",
      "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT" +
        gtNames.map("\t" + _).mkString)
    timed("vcf_cohort_write") {
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
    def vreadN(label: String, cols: Seq[String]): Double = {
      val t0 = System.nanoTime()
      val c = Vcf.read(spark, vcfFile, splitSize = vsplit, columns = cols).count()
      val t = (System.nanoTime() - t0) / 1e9
      require(c == nSite, s"$label read $c of $nSite")
      println(f"FORMATBENCH $label%-18s $t%7.2fs  ${nSite / t / 1e3}%6.1f ksite/s")
      t
    }
    val vFull = vreadN("vcf_cohort_full", Nil)
    val vSite = vreadN("vcf_cohort_site", Seq("chrom", "pos", "id", "infoKeys"))
    println(f"FORMATBENCH vcf_site_speedup ${vFull / vSite}%.2fx")

    val bcfFile = s"$dir/bench_cohort.bcf"
    val dicts = BcfIO.Dicts(Array("chr1"), Array("PASS"), Array("DP"),
      Array("GT", "DP"))
    timed("bcf_cohort_write") {
      BcfIO.write(Vcf.read(spark, vcfFile, splitSize = vsplit)
        .repartition(1).sortWithinPartitions("pos"), dicts, bcfFile)
    }
    def breadN(label: String, cols: Seq[String]): Double = {
      val t0 = System.nanoTime()
      val c = BcfIO.read(spark, bcfFile, columns = cols).count()
      val t = (System.nanoTime() - t0) / 1e9
      require(c == nSite, s"$label read $c of $nSite")
      println(f"FORMATBENCH $label%-18s $t%7.2fs  ${nSite / t / 1e3}%6.1f ksite/s")
      t
    }
    val bFull = breadN("bcf_cohort_full", Nil)
    val bSite = breadN("bcf_cohort_site", Seq("chrom", "pos", "id", "infoKeys"))
    println(f"FORMATBENCH bcf_site_speedup ${bFull / bSite}%.2fx")
    spark.stop()
  }
}
