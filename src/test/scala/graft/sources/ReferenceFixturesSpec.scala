package graft.sources

import graft.SparkSpec

/** End-to-end reads of the reference project's OWN test fixtures
  * (committed copies of its src/test/resources files — real
  * htsjdk/htslib-written data, not graft-written): the concrete
  * "switch from the reference and run what you run today" evidence,
  * spanning BAM (foreign, no sidecar index → split guessing), SAM,
  * misnamed BAM-with-.sam-extension (magic-based detection), VCF in
  * plain/bgzf/plain-gzip forms, tabix-bounded HiSeq reads through the
  * shipped foreign .tbi, BCF both uncompressed and BGZF, and FASTA.
  */
class ReferenceFixturesSpec extends SparkSpec {

  private def res(name: String): String =
    getClass.getClassLoader.getResource(name).getFile

  test("foreign BAM (htsjdk-written, no index) reads via split guessing") {
    val recs = BamIO.read(spark, res("test.bam")).collect()
    assert(recs.length > 0)
    val header = BamIO.readHeader(res("test.bam"))
    assert(header.refs.nonEmpty)
    val refNames = header.refs.map(_.name).toSet
    recs.foreach { r =>
      assert(r.rname == "*" || refNames.contains(r.rname), r.rname)
      if (r.seq != "*" && r.qual != "*")
        assert(r.seq.length === r.qual.length, r.qname)
    }
    // same bytes under a .sam name: magic-based detection must route
    // the misnamed file to the BAM reader and yield identical records
    assert(GraftIO.detect(res("misnamedBam.sam")) === GraftIO.BamFormat)
    val mis = GraftIO.readAlignments(spark, res("misnamedBam.sam")).collect()
    assert(mis.map(_.qname).sorted.toSeq === recs.map(_.qname).sorted.toSeq)
  }

  test("foreign SAM reads with header and records intact") {
    val header = Sam.readHeader(res("test.sam"))
    assert(header.refs.map(_.name).contains("chr21"))
    val recs = Sam.read(spark, res("test.sam")).collect()
    assert(recs.length > 0)
    assert(recs.forall(r => r.qual == "*" || r.seq == "*" ||
      r.seq.length == r.qual.length))
  }

  test("headerless SAM reads records with an empty header") {
    val recs = Sam.read(spark, res("test_headerless.sam")).collect()
    assert(recs.length === 2)
    assert(recs.map(_.qname).toSet ===
      Set("read_28833_29006_6945", "read_28701_28881_323b"))
    assert(Sam.readHeader(res("test_headerless.sam")).text === "")
  }

  test("one VCF, three compressions: plain, BGZF, plain-gzip agree") {
    def key(v: graft.model.VcfVariant) = (v.chrom, v.pos, v.ref, v.alt.mkString(","))
    val plain = Vcf.read(spark, res("test.vcf")).collect().map(key).sorted.toSeq
    val bgz = Vcf.read(spark, res("test.vcf.bgz")).collect().map(key).sorted.toSeq
    val gz = Vcf.read(spark, res("test.vcf.gz")).collect().map(key).sorted.toSeq
    assert(plain.nonEmpty)
    assert(bgz === plain)
    assert(gz === plain)
  }

  test("HiSeq VCF: 9965 sites; foreign .tbi bounds match full-scan filter") {
    val full = Vcf.read(spark, res("HiSeq.10000.vcf.bgz")).collect()
    assert(full.length === 9965)
    val lo = 1000000L
    val hi = 2000000L
    val bounded = Vcf.readIntervals(spark, res("HiSeq.10000.vcf.bgz"),
      Seq(("chr1", lo.toInt, hi.toInt))).collect()
      .map(v => (v.chrom, v.pos)).sorted.toSeq
    val expect = full.filter(v => v.chrom == "chr1" && v.pos >= lo && v.pos <= hi)
      .map(v => (v.chrom, v.pos)).sorted.toSeq
    assert(bounded === expect)
    assert(bounded.nonEmpty)
  }

  test("foreign BCF reads: uncompressed and BGZF forms agree, full decode") {
    def key(v: graft.model.VcfVariant) =
      (v.chrom, v.pos, v.id, v.ref, v.alt.mkString(","), v.qual, v.filter,
        v.infoKeys.zip(v.infoValues).map(kv => s"${kv._1}=${kv._2}").mkString(";"),
        v.format.mkString(":"), v.genotypes.mkString("\t"))
    val unc = BcfIO.read(spark, res("test.uncompressed.bcf")).collect().sortBy(_.pos)
    val bgzf = BcfIO.read(spark, res("test.bgzf.bcf")).collect().sortBy(_.pos)
    assert(unc.length === 5) // the canonical VCFv4.1 spec example
    assert(unc.map(key).toSeq === bgzf.map(key).toSeq)
    // htslib writes natively-typed INFO (int/float vectors) and the
    // shared IDX= dictionary — spot-check the full first site
    val r = unc.head
    assert(r.chrom === "20" && r.pos === 14370L && r.id === "rs6054257")
    assert(r.ref === "G" && r.alt.toSeq === Seq("A"))
    assert(r.qual === Some(29.0) && r.filter === "PASS")
    assert(r.infoKeys.zip(r.infoValues).toSeq ===
      Seq(("NS", "3"), ("DP", "14"), ("AF", "0.5"), ("DB", ""), ("H2", "")))
    assert(r.format.toSeq === Seq("GT", "GQ", "DP", "HQ"))
    assert(r.genotypes.toSeq ===
      Seq("0|0:48:1:51,51", "1|0:48:8:51,51", "1/1:43:5:.,."))
  }

  test("VCF with an invalid INFO field reads leniently, value preserved") {
    // the reference needs htsjdk LENIENT stringency for this file (an
    // embedded space inside an INFO value, TestVCFInputFormatStringency
    // .java); graft's parser treats INFO values as text and keeps it
    val recs = Vcf.read(spark, res("invalid_info_field.vcf")).collect()
    assert(recs.length === 5)
    val first = recs.minBy(_.pos)
    val ann = first.infoKeys.zip(first.infoValues).find(_._1 == "ANN").map(_._2)
    assert(ann.exists(_.contains("MODIFIER |WASH7P")), ann.toString)
  }

  test("foreign FASTA: contigs, .fai build, ranged region fetch") {
    val fa = res("mini-chr1-chr2.fasta")
    val frags = Fasta.read(spark, fa).collect()
    assert(frags.map(_.contig).toSet === Set("chr1", "chr2"))
    val entries = Fasta.buildFai(fa)
    assert(entries.map(_.name).toSet === Set("chr1", "chr2"))
    val chr1 = entries.find(_.name == "chr1").get
    val head = Fasta.region(fa, "chr1", 1, 12)
    assert(head === "TAACCCTAACCC")
    assert(chr1.length >= 12)
  }
}
