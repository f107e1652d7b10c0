package graft.sources

import graft.SparkSpec
import graft.model.VcfVariant

/** Lazy VCF/BCF genotype decode (ref: LazyVCFGenotypesContext.java:1,
  * LazyBCFGenotypesContext.java:1): a site-only read never parses —
  * for BCF, never even reads — the genotype matrix.  Parity bar: the
  * masked decode must agree with the full decode on every requested
  * column, across the typed APIs and the DSv2 pruned-schema faces. */
class LazyGenotypeSpec extends SparkSpec {

  private val nSamples = 40
  private val nSites = 120

  private def vcfLines: Seq[String] = {
    val samples = (0 until nSamples).map(i => s"s$i")
    val header = Seq(
      "##fileformat=VCFv4.3",
      "##INFO=<ID=DP,Number=1,Type=Integer,Description=\"depth\">",
      "##INFO=<ID=END,Number=1,Type=Integer,Description=\"end\">",
      "##FORMAT=<ID=GT,Number=1,Type=String,Description=\"gt\">",
      "##FORMAT=<ID=DP,Number=1,Type=Integer,Description=\"dp\">",
      "##contig=<ID=c1,length=100000>",
      ("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT" +
        samples.map("\t" + _).mkString))
    val recs = (0 until nSites).map { i =>
      val gts = (0 until nSamples).map(s => s"${s % 2}/${(s + i) % 2}:${s + i}")
      (s"c1\t${100 + i * 13}\tv$i\tA\tG\t50\tPASS\tDP=${i % 90}" +
        (if (i % 11 == 0) s";END=${100 + i * 13 + 500}" else "") +
        "\tGT:DP" + gts.map("\t" + _).mkString)
    }
    header ++ recs
  }

  private lazy val vcfPath: String = {
    val p = s"${tmpDir("lazy_vcf")}/many.vcf"
    java.nio.file.Files.write(java.nio.file.Paths.get(p),
      vcfLines.mkString("", "\n", "\n").getBytes("UTF-8"))
    p
  }

  private def site(v: VcfVariant) =
    (v.chrom, v.pos, v.id, v.ref, v.alt.toSeq, v.qual, v.filter)

  test("masked parseLine agrees with the full parse on site and INFO fields") {
    val line = vcfLines.last
    val full = Vcf.parseLine(line)
    val siteOnly = Vcf.parseLine(line, 0)
    val noGt = Vcf.parseLine(line, Vcf.FInfo)
    assert(site(siteOnly) === site(full))
    assert(site(noGt) === site(full))
    assert(noGt.infoKeys.toSeq === full.infoKeys.toSeq)
    assert(noGt.infoValues.toSeq === full.infoValues.toSeq)
    assert(siteOnly.infoKeys.isEmpty && siteOnly.genotypes.isEmpty)
    assert(noGt.genotypes.isEmpty && noGt.format.isEmpty)
    assert(full.genotypes.length === nSamples)
  }

  test("typed VCF site-only read equals the full read on requested columns") {
    val full = Vcf.read(spark, vcfPath).collect().sortBy(_.pos)
    val masked = Vcf.read(spark, vcfPath, columns = Seq("chrom", "pos", "id"))
      .collect().sortBy(_.pos)
    assert(masked.length === full.length)
    masked.zip(full).foreach { case (m, f) =>
      assert(site(m) === site(f))
      assert(m.genotypes.isEmpty && m.format.isEmpty && m.infoKeys.isEmpty)
    }
  }

  test("DSv2 vcf face prunes genotype decode but keeps it when requested") {
    val df = spark.read.format("vcf").load(vcfPath)
    val sites = df.selectExpr("chrom", "pos", "id").collect().sortBy(_.getLong(1))
    assert(sites.length === nSites)
    assert(sites.head.getString(2) === "v0")
    // requesting genotypes still decodes them
    val gts = df.selectExpr("pos", "genotypes").collect().sortBy(_.getLong(0))
    assert(gts.head.getSeq[String](1).length === nSamples)
  }

  private lazy val bcfPath: String = {
    import spark.implicits._
    val dicts = BcfIO.Dicts(Array("c1"), Array("PASS"),
      Array("DP", "END"), Array("GT", "DP"))
    val vs = Vcf.read(spark, vcfPath).collect().sortBy(_.pos).toSeq
    val p = s"${tmpDir("lazy_bcf")}/many.bcf"
    BcfIO.write(spark.createDataset(vs).coalesce(1), dicts, p, granularity = 32)
    p
  }

  test("BCF site-only read equals the full read on requested columns") {
    val full = BcfIO.read(spark, bcfPath).collect().sortBy(_.pos)
    assert(full.head.genotypes.length === nSamples)
    val masked = BcfIO.read(spark, bcfPath, columns = Seq("chrom", "pos", "filter"))
      .collect().sortBy(_.pos)
    assert(masked.length === full.length)
    masked.zip(full).foreach { case (m, f) =>
      assert(site(m) === site(f))
      assert(m.genotypes.isEmpty && m.infoKeys.isEmpty)
    }
    // INFO-but-not-genotypes masking
    val info = BcfIO.read(spark, bcfPath, columns = Seq("pos", "infoKeys", "infoValues"))
      .collect().sortBy(_.pos)
    info.zip(full).foreach { case (m, f) =>
      assert(m.infoKeys.toSeq === f.infoKeys.toSeq)
      assert(m.infoValues.toSeq === f.infoValues.toSeq)
      assert(m.genotypes.isEmpty)
    }
  }

  test("BCF bounded masked read keeps END-span overlap semantics") {
    val iv = Seq(("c1", 600, 700))
    val full = BcfIO.readIntervals(spark, bcfPath, iv).collect().map(_.id).sorted
    val masked = BcfIO.readIntervals(spark, bcfPath, iv,
      columns = Seq("chrom", "pos", "id")).collect().map(_.id).sorted
    assert(masked.toSeq === full.toSeq)
    assert(full.nonEmpty)
  }

  test("DSv2 pruned-schema masks: empty means count(*), not everything") {
    import org.apache.spark.sql.types.{StructField, StructType, StringType}
    import graft.sources.v2.GraftDataSources
    def schemaOf(names: String*) = StructType(names.map(StructField(_, StringType)))
    // the ADVICE r8 case: a count(*) arrives as an EMPTY pruned schema
    // and must decode site fields only — not route through the typed
    // readers' Nil-means-everything convention
    assert(GraftDataSources.vcfPrunedMask(schemaOf()) === 0)
    assert(GraftDataSources.vcfPrunedMask(schemaOf("chrom", "pos", "id")) === 0)
    assert(GraftDataSources.vcfPrunedMask(schemaOf("pos", "infoKeys")) === Vcf.FInfo)
    assert(GraftDataSources.vcfPrunedMask(schemaOf("genotypes")) === Vcf.FGenotypes)
    assert(GraftDataSources.bamPrunedMask(schemaOf()) === 0)
    assert(GraftDataSources.bamPrunedMask(schemaOf("qname", "seq")) ===
      (BamCodec.FName | BamCodec.FSeq))
    // and count(*) over the faces still counts every record
    assert(spark.read.format("vcf").load(vcfPath).count() === nSites)
    assert(spark.read.format("bcf").load(bcfPath).count() === nSites)
  }

  test("bounded DSv2 reads stay lazy: site-only projection over intervals") {
    // the bounded (intervals-option) partition path ORs INFO back in
    // for END-span overlap, but must NOT silently decode genotypes
    val expect = Vcf.read(spark, vcfPath).collect()
      .filter(v => v.pos <= 700 && Vcf.spanEnd(v) >= 600).map(_.pos).sorted
    for (fmt <- Seq("vcf", "bcf")) {
      val path = if (fmt == "vcf") vcfPath else bcfPath
      val df = spark.read.format(fmt).option("intervals", "c1:600-700").load(path)
      val hit = df.selectExpr("pos").collect().map(_.getLong(0)).sorted
      assert(hit.toSeq === expect.toSeq, s"$fmt bounded site-only read")
      // count(*) over the bounded scan: empty pruned schema + intervals
      assert(df.count() === expect.length.toLong, s"$fmt bounded count")
    }
  }

  test("DSv2 bcf face prunes genotype decode but keeps it when requested") {
    val df = spark.read.format("bcf").load(bcfPath)
    val sites = df.selectExpr("chrom", "pos", "id").collect().sortBy(_.getLong(1))
    assert(sites.length === nSites)
    val gts = df.selectExpr("pos", "genotypes").collect().sortBy(_.getLong(0))
    assert(gts.head.getSeq[String](1).length === nSamples)
    // pruned + pushed interval filter still exact (END spans included)
    val hit = df.filter("chrom = 'c1' and pos >= 100 and pos <= 400")
      .selectExpr("pos").collect().map(_.getLong(0)).sorted
    val expect = Vcf.read(spark, vcfPath).collect()
      .filter(v => v.pos >= 100 && v.pos <= 400).map(_.pos).sorted
    assert(hit.toSeq === expect.toSeq)
  }
}
