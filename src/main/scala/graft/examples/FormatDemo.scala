package graft.examples

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.model.{SamHeader, SamRecord, SamRef}
import graft.sources._

/** End-to-end format-layer demo (the role examples/TestBAM.java plays
  * in the reference): derive reads from the benchmark tables, write
  * them as BAM with a splitting index, read back with bounded
  * traversal, round-trip SAM/FASTQ/VCF, and print what happened.
  *
  * Run: sbt "runMain graft.examples.FormatDemo /root/testdata/sf0.001 /tmp/graft_demo"
  */
object FormatDemo {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    new java.io.File(outDir).mkdirs()

    val header = SamHeader(
      "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chrA\tLN:2000\n@SQ\tSN:chrN\tLN:2000\n@SQ\tSN:chrR\tLN:2000",
      Array(SamRef("chrA", 2000), SamRef("chrN", 2000), SamRef("chrR", 2000)))

    // lineitem → reads (the SURVEY §3 analog mapping, made literal)
    val reads = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(
        concat(lit("r"), col("l_orderkey"), lit("_"), col("l_linenumber")).as("qname"),
        (col("l_orderkey") % 4096).cast("int").as("flag"),
        concat(lit("chr"), col("l_returnflag")).as("rname"),
        ((col("l_partkey") * 3) % 1000 + 1).cast("int").as("pos"),
        (col("l_suppkey") % 60).cast("int").as("mapq"),
        concat(floor(col("l_quantity")).cast("int"), lit("M")).as("cigar"),
        lit("*").as("rnext"), lit(0).as("pnext"), lit(0).as("tlen"),
        expr("substring(repeat('ACGT', 13), 1, CAST(FLOOR(l_quantity) AS INT))").as("seq"),
        expr("substring(repeat('IIII', 13), 1, CAST(FLOOR(l_quantity) AS INT))").as("qual"),
        expr("array(concat('NM:i:', CAST(l_linenumber AS STRING)))").as("tags"))

    val ds = reads.as[SamRecord]
      .orderBy(col("rname"), col("pos")).as[SamRecord]
    val n = ds.count()

    val bam = s"$outDir/demo.bam"
    BamIO.write(ds, header, bam, granularity = 500)
    val full = BamIO.read(spark, bam).count()
    val bounded = BamIO.read(spark, bam, intervals = Seq(("chrA", 100, 300))).count()
    println(s"[demo] BAM: wrote $n, read $full, bounded-traversal chrA:100-300 -> $bounded")

    val sam = s"$outDir/demo.sam"
    Sam.writeSorted(ds, header, sam)
    val samBack = Sam.read(spark, sam).count()
    println(s"[demo] SAM: merged single file, read $samBack (detect=${GraftIO.detect(sam)})")

    val fq = s"$outDir/demo.fastq"
    Fastq.write(ds.map(r => graft.model.SequencedFragment(
      r.qname, r.seq, r.qual, "demo", 1, 1, 1, 0, 0, 1, true)), fq)
    println(s"[demo] FASTQ: read back ${Fastq.read(spark, fq).count()} (detect=${GraftIO.detect(fq)})")

    // VCF round-trip derived from part (examples/TestVCF analog)
    val vcfHeader = Vcf.VcfHeader(Seq(
      "##fileformat=VCFv4.3",
      "##INFO=<ID=DP,Number=1,Type=Integer,Description=\"Depth\">",
      "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"))
    val variants = spark.read.parquet(s"$sfDir/part.parquet")
      .select(
        concat(lit("chr"), (col("p_partkey") % 3).cast("string")).as("chrom"),
        (col("p_partkey") + 1).as("pos"),
        concat(lit("rs"), col("p_partkey")).as("id"),
        lit("A").as("ref"), expr("array('G')").as("alt"),
        expr("CAST(p_size AS DOUBLE)").as("qual"),
        lit("PASS").as("filter"),
        expr("array('DP')").as("infoKeys"),
        expr("array(CAST(p_size AS STRING))").as("infoValues"),
        expr("CAST(array() AS ARRAY<STRING>)").as("format"),
        expr("CAST(array() AS ARRAY<STRING>)").as("genotypes"))
      .as[graft.model.VcfVariant]
    val vcf = s"$outDir/demo.vcf"
    Vcf.write(variants, vcfHeader, vcf)
    println(s"[demo] VCF: read back ${Vcf.read(spark, vcf).count()} (detect=${GraftIO.detect(vcf)})")

    // foreign-BAM interop: spec .bai index instead of the graft sidecar
    Bai.buildAndWrite(bam)
    val (dfs, dp) = Fs.get(bam)
    dfs.delete(SplittingIndex.indexPath(dp), false)
    val viaBai = BamIO.read(spark, bam, intervals = Seq(("chrA", 100, 300))).count()
    println(s"[demo] BAI bounded traversal (no sidecar): chrA:100-300 -> $viaBai " +
      s"(matches sidecar path: ${viaBai == bounded})")

    println(s"[demo] detect(bam)=${GraftIO.detect(bam)}; any-alignment reader: " +
      s"${GraftIO.readAlignments(spark, sam).count()} from SAM, " +
      s"${GraftIO.readAlignments(spark, bam).count()} from BAM")

    // CRAM: container/block/slice layer, distributed read, autodetect
    val cram = s"$outDir/demo.cram"
    GraftIO.writeAlignments(ds, header, cram)
    val cramBack = GraftIO.readAlignments(spark, cram).count()
    val containers = Cram.enumerateContainers(cram)
    println(s"[demo] CRAM: wrote $n, read $cramBack across ${containers.size} containers " +
      s"(detect=${GraftIO.detect(cram)})")

    // CSI: generalized binning index as the foreign-index fallback
    Csi.buildAndWrite(bam)
    dfs.delete(Bai.indexPath(dp), false)
    val viaCsi = BamIO.read(spark, bam, intervals = Seq(("chrA", 100, 300))).count()
    println(s"[demo] CSI bounded traversal (no sidecar, no .bai): chrA:100-300 -> $viaCsi " +
      s"(matches: ${viaCsi == bounded})")

    // DataSource V2: the same formats as SQL tables — BAM predicate
    // pushdown prunes chunks through the index before tasks launch
    val sqlReads = spark.read.format("bam").load(bam)
      .filter(col("rname") === "chrA" && col("pos").between(100, 300))
    val sqlPlan = sqlReads.queryExecution.executedPlan.toString
    println(s"[demo] DSv2 bam: ${sqlReads.count()} rows via SQL filter " +
      s"(pushdown in plan: ${sqlPlan.contains("pushed")}); " +
      s"sam table: ${spark.read.format("sam").load(sam).count()}; " +
      s"cram table: ${spark.read.format("cram").load(cram).count()}")
    val v2out = s"$outDir/demo_v2.bam"
    spark.read.format("bam").load(bam)
      .write.format("bam").option("header", bam).mode("overwrite").save(v2out)
    println(s"[demo] DSv2 bam write: ${BamIO.read(spark, v2out).count()} rows back " +
      s"(sidecar: ${new java.io.File(v2out + ".sidx").exists()})")

    // BCF with typed genotype matrices through the variant dispatch
    val gtDicts = BcfIO.Dicts(Array("chr0", "chr1", "chr2"), Array("PASS"),
      Array("DP"), fmtKeys = Array("GT", "DP"))
    val gtVars = variants.limit(500)
      .map(v => v.copy(chrom = v.chrom, format = Array("GT", "DP"),
        genotypes = Array(s"0/1:${v.pos % 100}", s"1|1:${v.pos % 90}")))
    val bcf = s"$outDir/demo.bcf"
    BcfIO.write(gtVars, gtDicts, bcf)
    val gtBack = GraftIO.readVariants(spark, bcf)
    println(s"[demo] BCF: ${gtBack.count()} variants with genotypes " +
      s"(first: ${gtBack.orderBy("pos").head().genotypes.mkString(",")}; " +
      s"detect=${GraftIO.detect(bcf)})")
    spark.stop()
  }
}
