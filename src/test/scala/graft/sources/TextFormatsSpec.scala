package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.model.{SamRecord, SequencedFragment}

class SamSpec extends SparkSpec {

  private val headerText =
    "@HD\tVN:1.6\tSO:unknown\n@SQ\tSN:chr1\tLN:5000\n@SQ\tSN:chr2\tLN:4000"

  private def samLine(i: Int): String = {
    val contig = if (i % 2 == 0) "chr1" else "chr2"
    s"r$i\t${i % 256}\t$contig\t${1 + i % 4000}\t${i % 60}\t10M\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII" +
      (if (i % 3 == 0) s"\tNM:i:${i % 5}\tRG:Z:rg$i" else "")
  }

  test("header parse extracts refs and sort order") {
    val h = Sam.parseHeader(headerText)
    assert(h.refs.map(_.name).toSeq === Seq("chr1", "chr2"))
    assert(h.refs.map(_.length).toSeq === Seq(5000, 4000))
    assert(h.sortOrder === "unknown")
    assert(h.asCoordinateSorted.sortOrder === "coordinate")
  }

  test("read parses records via the splittable text scan") {
    val dir = tmpDir("sam")
    val f = s"$dir/t.sam"
    val lines = headerText +: (0 until 300).map(samLine)
    Files.write(Paths.get(f), lines.mkString("\n").getBytes(UTF_8))
    val h = Sam.readHeader(f)
    assert(h.refs.length === 2)
    val ds = Sam.read(spark, f)
    val rows = ds.collect()
    assert(rows.length === 300)
    val r0 = rows.find(_.qname == "r0").get
    assert(r0.rname === "chr1" && r0.pos === 1 && r0.cigar === "10M")
    assert(r0.tags.toSeq === Seq("NM:i:0", "RG:Z:rg0"))
    val r1 = rows.find(_.qname == "r1").get
    assert(r1.tags.isEmpty)
  }

  test("format + merge produce a single valid SAM with one header") {
    import spark.implicits._
    val dir = tmpDir("sam2")
    val f = s"$dir/in.sam"
    Files.write(Paths.get(f),
      (headerText +: (0 until 100).map(samLine)).mkString("\n").getBytes(UTF_8))
    val ds = Sam.read(spark, f)
    val out = s"$dir/out.sam"
    Sam.writeSorted(ds, Sam.parseHeader(headerText), out)
    val text = new String(Files.readAllBytes(Paths.get(out)), UTF_8)
    val outLines = text.split("\n")
    assert(outLines.count(_.startsWith("@HD")) === 1)
    assert(outLines.head.contains("SO:coordinate"))
    val recs = outLines.filterNot(_.startsWith("@"))
    assert(recs.length === 100)
    // coordinate-sorted: chr1 block then chr2 block, pos ascending within
    val parsed = recs.map(_.split("\t")).map(a => (a(2), a(3).toInt))
    val chr1 = parsed.filter(_._1 == "chr1").map(_._2)
    assert(chr1.toSeq === chr1.sorted.toSeq)
    assert(parsed.map(_._1).toSeq === parsed.map(_._1).sortBy(c => c).toSeq)
    // round-trip identity modulo order
    val back = Sam.read(spark, out).collect()
    assert(back.map(_.qname).sorted === (0 until 100).map(i => s"r$i").sorted.toArray)
    val _ = ds
  }
}

class FastqSpec extends SparkSpec {

  private def rec(i: Int): String = {
    val seq = "ACGTACGTACGTACGTACGT".take(8 + i % 12)
    val qual = "IIIIFFFF@@@@####AAAA".take(8 + i % 12)
    s"@inst:$i:FC:1:2:${i * 3}:${i * 7} ${1 + i % 2}:${if (i % 5 == 0) "Y" else "N"}:0:ATCACG\n$seq\n+\n$qual"
  }

  test("casava read-name metadata parses") {
    val f = Fastq.parseName("@inst:42:FC:3:1101:1000:2000", "1:N:0:ATCACG")
    assert(f.instrument === "inst")
    assert(f.runNumber === 42)
    assert(f.lane === 3 && f.tile === 1101 && f.xpos === 1000 && f.ypos === 2000)
    assert(f.read === 1)
    assert(f.filterPassed)
    val failed = Fastq.parseName("@inst:42:FC:3:1101:1000:2000", "2:Y:0:ATCACG")
    assert(!failed.filterPassed && failed.read === 2)
  }

  test("quality encoding conversion shifts by 31") {
    assert(Fastq.convertQuality("!I", fromSanger = true) === "@h")
    assert(Fastq.convertQuality("@h", fromSanger = false) === "!I")
  }

  test("split reads agree with whole-file read at any split size") {
    val dir = tmpDir("fastq")
    val f = s"$dir/t.fastq"
    val content = (0 until 400).map(rec).mkString("\n") + "\n"
    Files.write(Paths.get(f), content.getBytes(UTF_8))
    val whole = Fastq.read(spark, f, splitSize = 1L << 30).collect()
    assert(whole.length === 400)
    for (split <- Seq(512L, 1999L, 7777L)) {
      val got = Fastq.read(spark, f, splitSize = split).collect()
      assert(got.map(_.name).sorted === whole.map(_.name).sorted,
        s"splitSize=$split record set mismatch")
    }
  }

  test("failed-QC filter drops Y-flagged reads") {
    val dir = tmpDir("fastq2")
    val f = s"$dir/t.fastq"
    Files.write(Paths.get(f), ((0 until 50).map(rec).mkString("\n") + "\n").getBytes(UTF_8))
    val kept = Fastq.read(spark, f, filterFailedQc = true).collect()
    assert(kept.length === 50 - 10) // every 5th is Y (failed)
  }

  test("fastq write + read round-trip") {
    import spark.implicits._
    val dir = tmpDir("fastq3")
    val frags = (0 until 60).map(i => SequencedFragment(
      s"q$i", "ACGTACGT", "IIIIIIII", "m", 1, 1, 1, i, i, 1 + i % 2, true))
    val out = s"$dir/o.fastq"
    Fastq.write(spark.createDataset(frags), out)
    val back = Fastq.read(spark, out).collect()
    assert(back.length === 60)
    assert(back.map(_.sequence).distinct.toSeq === Seq("ACGTACGT"))
  }
}

class QseqSpec extends SparkSpec {
  test("qseq line round-trip with N-dots and illumina quality") {
    val line = "M10\t5\t3\t1101\t100\t200\t0\t1\tACG.TT\thhhhhh\t1"
    val f = Qseq.parseLine(line)
    assert(f.sequence === "ACGNTT") // '.' → N
    assert(f.quality === "IIIIII") // phred+64 'h' → phred+33 'I'
    assert(f.lane === 3 && f.filterPassed)
    assert(Qseq.formatLine(f) === line)
  }

  test("qseq distributed read") {
    val dir = tmpDir("qseq")
    val f = s"$dir/t.qseq"
    val lines = (0 until 100).map(i =>
      s"M\t1\t${1 + i % 8}\t1101\t$i\t$i\t0\t${1 + i % 2}\tACGT.A\thhhhhh\t${i % 2}")
    Files.write(Paths.get(f), lines.mkString("\n").getBytes(UTF_8))
    assert(Qseq.read(spark, f).count() === 100)
    assert(Qseq.read(spark, f, filterFailedQc = true).count() === 50)
  }
}

class FastaSpec extends SparkSpec {
  test("fragments carry exact per-contig positions at any split size") {
    val dir = tmpDir("fasta")
    val f = s"$dir/ref.fa"
    val c1 = (0 until 50).map(i => "ACGTACGTGG").mkString("") // 500 bases
    val c2 = (0 until 30).map(i => "TTTTACGTAC").mkString("")
    val content = s">chr1 desc\n${c1.grouped(60).mkString("\n")}\n>chr2\n${c2.grouped(60).mkString("\n")}\n"
    Files.write(Paths.get(f), content.getBytes(UTF_8))
    for (split <- Seq(1L << 30, 128L, 61L)) {
      val frags = Fasta.read(spark, f, splitSize = split).collect()
      val byContig = frags.groupBy(_.contig)
      assert(byContig.keySet === Set("chr1", "chr2"), s"split=$split")
      def reassemble(c: String): String =
        byContig(c).sortBy(_.start).map(_.sequence).mkString("")
      assert(reassemble("chr1") === c1, s"split=$split")
      assert(reassemble("chr2") === c2, s"split=$split")
      // positions are 1-based and contiguous
      val sorted = byContig("chr1").sortBy(_.start)
      assert(sorted.head.start === 1)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b.start === a.start + a.sequence.length)
        case _ =>
      }
    }
  }

  test(".fai index: O(1) region fetch and index-driven split planning") {
    val dir = tmpDir("fai")
    val f = s"$dir/ref.fa"
    val rng = new scala.util.Random(7)
    val c1 = (0 until 997).map(_ => "ACGT" (rng.nextInt(4))).mkString // uneven tail line
    val c2 = (0 until 240).map(_ => "GTCA" (rng.nextInt(4))).mkString
    val content = s">chr1 desc here\n${c1.grouped(60).mkString("\n")}\n" +
      s">chr2\n${c2.grouped(80).mkString("\n")}\n"
    Files.write(Paths.get(f), content.getBytes(UTF_8))
    val entries = Fasta.buildAndWriteFai(f)
    assert(entries.map(e => (e.name, e.length, e.lineBases, e.lineWidth)) ===
      Seq(("chr1", 997L, 60, 61), ("chr2", 240L, 80, 81)))
    // sidecar round-trip
    assert(Fasta.readFai(f).get === entries)
    // region fetch matches direct slicing at every alignment case:
    // line start, mid-line, crossing lines, contig tail, clamped end
    for ((s, t) <- Seq((1L, 60L), (61L, 61L), (30L, 130L), (950L, 997L),
      (990L, 2000L), (5L, 4L))) {
      val expect = if (t < s) "" else
        c1.substring((s - 1).toInt, math.min(997L, t).toInt)
      assert(Fasta.region(f, "chr1", s, t) === expect, s"[$s,$t]")
    }
    assert(Fasta.region(f, "chr2", 81, 160) === c2.substring(80, 160))
    // read() plans from the index now — same fragments as the scan path
    val viaFai = Fasta.read(spark, f, splitSize = 128).collect()
    def reassemble(frags: Array[graft.model.ReferenceFragment], c: String) =
      frags.filter(_.contig == c).sortBy(_.start).map(_.sequence).mkString
    assert(reassemble(viaFai, "chr1") === c1)
    assert(reassemble(viaFai, "chr2") === c2)
    // bounded distributed read touches only the asked intervals
    val got = Fasta.readRegions(spark, f,
      Seq(("chr1", 100L, 400L), ("chr2", 1L, 90L)), splitSize = 128).collect()
    assert(reassemble(got, "chr1") === c1.substring(99, 400))
    assert(reassemble(got, "chr2") === c2.substring(0, 90))
    assert(got.length > 2) // actually split into multiple tasks
    // uneven interior lines must refuse to index
    val bad = s"$dir/bad.fa"
    Files.write(Paths.get(bad), ">c\nACGTACGT\nACG\nACGTACGT\n".getBytes(UTF_8))
    val e = intercept[IllegalArgumentException](Fasta.buildFai(bad))
    assert(e.getMessage.contains("uneven"))
    // ...and so must a LAST line wider than the established width
    val bad2 = s"$dir/bad2.fa"
    Files.write(Paths.get(bad2), ">c\nACGT\nACGTACGT\n".getBytes(UTF_8))
    val e2 = intercept[IllegalArgumentException](Fasta.buildFai(bad2))
    assert(e2.getMessage.contains("wider"))
  }

  test("CRLF FASTA: .fai byte arithmetic, region() and read() stay exact") {
    val dir = tmpDir("faicrlf")
    val f = s"$dir/ref.fa"
    val rng = new scala.util.Random(5)
    val c1 = (0 until 500).map(_ => "ACGT" (rng.nextInt(4))).mkString
    val content = s">chr1\r\n${c1.grouped(60).mkString("\r\n")}\r\n"
    Files.write(Paths.get(f), content.getBytes(UTF_8))
    val entries = Fasta.buildAndWriteFai(f)
    // samtools records lineWidth = lineBases + 2 on CRLF files
    assert(entries.map(e => (e.name, e.length, e.lineBases, e.lineWidth)) ===
      Seq(("chr1", 500L, 60, 62)))
    for ((s, t) <- Seq((1L, 60L), (61L, 61L), (30L, 130L), (450L, 500L)))
      assert(Fasta.region(f, "chr1", s, t) ===
        c1.substring((s - 1).toInt, t.toInt), s"[$s,$t]")
    // index-planned splits frame whole lines exactly once
    val frags = Fasta.read(spark, f, splitSize = 128).collect()
    assert(frags.sortBy(_.start).map(_.sequence).mkString === c1)
    // scan-planned splits (no .fai) agree
    val (fs, p) = Fs.get(f)
    fs.delete(new org.apache.hadoop.fs.Path(Fasta.faiPath(f)), false)
    val frags2 = Fasta.read(spark, f, splitSize = 128).collect()
    assert(frags2.sortBy(_.start).map(_.sequence).mkString === c1)
  }
}

class VcfSpec extends SparkSpec {

  private val header = Seq(
    "##fileformat=VCFv4.3",
    "##INFO=<ID=DP,Number=1,Type=Integer,Description=\"Depth\">",
    "##INFO=<ID=AF,Number=A,Type=Float,Description=\"Freq\">",
    "##INFO=<ID=DB,Number=0,Type=Flag,Description=\"dbSNP\">",
    "##FILTER=<ID=q10,Description=\"low qual\">",
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2")

  private def vcfLine(i: Int): String = {
    val info = if (i % 3 == 0) s"DP:${"="}${i * 2};DB".replace(":", "") else s"DP=${i * 2};AF=0.5"
    s"chr${1 + i % 2}\t${100 + i * 10}\trs$i\tA\t${if (i % 4 == 0) "G,T" else "C"}\t${i % 100}\t${if (i % 5 == 0) "q10" else "PASS"}\t$info\tGT:DP\t0/1:$i\t1/1:${i + 1}"
  }

  test("header typed-INFO declarations parse") {
    val h = Vcf.VcfHeader(header)
    assert(h.infoTypes === Map("DP" -> "Integer", "AF" -> "Float", "DB" -> "Flag"))
    assert(h.samples === Seq("S1", "S2"))
  }

  test("record line parse extracts typed fields, flags and genotypes") {
    val v = Vcf.parseLine(vcfLine(0))
    assert(v.chrom === "chr1" && v.pos === 100)
    assert(v.alt.toSeq === Seq("G", "T"))
    assert(v.infoKeys.toSeq === Seq("DP", "DB"))
    assert(v.infoValues.toSeq === Seq("0", "")) // DB is a flag
    assert(v.format.toSeq === Seq("GT", "DP"))
    assert(v.genotypes.toSeq === Seq("0/1:0", "1/1:1"))
    assert(Vcf.formatLine(v) === vcfLine(0))
  }

  test("distributed read of plain and bgzf VCF agree") {
    val dir = tmpDir("vcf")
    val plain = s"$dir/t.vcf"
    val content = (header ++ (0 until 300).map(vcfLine)).mkString("\n") + "\n"
    Files.write(Paths.get(plain), content.getBytes(UTF_8))
    val bgz = s"$dir/t.vcf.bgz"
    val out = new Bgzf.BgzfOutputStream(new java.io.FileOutputStream(bgz), blockSize = 600)
    out.write(content.getBytes(UTF_8))
    out.close()
    val a = Vcf.read(spark, plain, splitSize = 2048).collect()
    val b = Vcf.read(spark, bgz, splitSize = 2048).collect()
    assert(a.length === 300)
    assert(a.map(_.pos).sorted === b.map(_.pos).sorted)
    assert(Vcf.readHeader(bgz).lines === header)
  }

  test("write + merge yields one header and all records") {
    import spark.implicits._
    val dir = tmpDir("vcf2")
    val vs = (0 until 80).map(i => Vcf.parseLine(vcfLine(i)))
    val out = s"$dir/o.vcf"
    Vcf.write(spark.createDataset(vs).repartition(3), Vcf.VcfHeader(header), out)
    val text = new String(Files.readAllBytes(Paths.get(out)), UTF_8)
    assert(text.linesIterator.count(_.startsWith("##fileformat")) === 1)
    assert(text.linesIterator.count(l => l.nonEmpty && !l.startsWith("#")) === 80)
    val back = Vcf.read(spark, out).collect()
    assert(back.map(_.id).sorted === vs.map(_.id).sorted.toArray)
  }
}

class GraftIOSpec extends SparkSpec {
  test("magic + extension detection across formats") {
    val dir = tmpDir("detect")
    def write(name: String, bytes: Array[Byte]): String = {
      val p = s"$dir/$name"
      Files.write(Paths.get(p), bytes)
      p
    }
    val sam = write("a.sam", "@HD\tVN:1.6\nr1\t0\t*\t0\t0\t*\t*\t0\t0\tAC\tII".getBytes(UTF_8))
    assert(GraftIO.detect(sam) === GraftIO.SamFormat)
    val vcf = write("a.vcf", "##fileformat=VCFv4.3\n#CHROM\n".getBytes(UTF_8))
    assert(GraftIO.detect(vcf) === GraftIO.VcfFormat)
    val fasta = write("a.fa", ">chr1\nACGT\n".getBytes(UTF_8))
    assert(GraftIO.detect(fasta) === GraftIO.FastaFormat)
    val fastq = write("a.fastq", "@r1\nACGT\n+\nIIII\n".getBytes(UTF_8))
    assert(GraftIO.detect(fastq) === GraftIO.FastqFormat)
    // BAM: BGZF-wrapped magic
    val bos = new java.io.ByteArrayOutputStream()
    val bo = new Bgzf.BgzfOutputStream(bos)
    bo.write("BAM\u0001rest-of-header".getBytes(UTF_8))
    bo.close()
    val bam = write("a.bam", bos.toByteArray)
    assert(GraftIO.detect(bam) === GraftIO.BamFormat)
    // bgzipped VCF
    val bos2 = new java.io.ByteArrayOutputStream()
    val bo2 = new Bgzf.BgzfOutputStream(bos2)
    bo2.write("##fileformat=VCFv4.3\n".getBytes(UTF_8))
    bo2.close()
    val vcfbgz = write("a.vcf.bgz", bos2.toByteArray)
    assert(GraftIO.detect(vcfbgz) === GraftIO.VcfFormat)
    val cram = write("a.cram", "CRAM\u0003\u0000".getBytes(UTF_8) ++ new Array[Byte](20))
    assert(GraftIO.detect(cram) === GraftIO.CramFormat)
    // headerless SAM by content heuristic
    val hless = write("noext1", "r1\t0\tchr1\t100\t60\t4M\t*\t0\t0\tACGT\tIIII".getBytes(UTF_8))
    assert(GraftIO.detect(hless) === GraftIO.SamFormat)
  }
}

class BcfSpec extends SparkSpec {
  test("INFO keys resolve through the header dictionary, not record order") {
    // regression: a record whose keys are a subset/reordering of the
    // dictionary must keep its own key names
    val contigs = Array("chr1"); val filters = Array("PASS")
    val infoKeys = Array("DP", "AF", "DB")
    val v = graft.model.VcfVariant("chr1", 10L, "rs1", "A", Array("C"),
      Some(5.0), "PASS", Array("AF", "DB"), Array("0.5", ""),
      Array.empty, Array.empty)
    val dir = tmpDir("bcfk")
    Bcf.write(s"$dir/k.bcf", "##h", Seq(v), contigs, filters, infoKeys)
    val (_, back) = Bcf.read(s"$dir/k.bcf", contigs, filters, infoKeys)
    assert(back.head.infoKeys.toSeq === Seq("AF", "DB"))
    assert(back.head.infoValues.toSeq === Seq("0.5", ""))
  }

  test("long typed strings (>=127 bytes) round-trip via the length escape") {
    val contigs = Array("chr1"); val filters = Array("PASS")
    val infoKeys = Array("ANN")
    val long = "x" * 300
    val v = graft.model.VcfVariant("chr1", 10L, "rs1", "A", Array("C"),
      None, "PASS", Array("ANN"), Array(long), Array.empty, Array.empty)
    val dir = tmpDir("bcfl")
    Bcf.write(s"$dir/l.bcf", "##h", Seq(v, v.copy(pos = 11L)), contigs, filters, infoKeys)
    val (_, back) = Bcf.read(s"$dir/l.bcf", contigs, filters, infoKeys)
    assert(back.length === 2)
    assert(back.forall(_.infoValues.head === long))
  }

  test("many filters (>14) and large filter indices round-trip") {
    val contigs = Array("chr1")
    val filters = (0 until 200).map(i => s"f$i").toArray
    val infoKeys = Array.empty[String]
    val v = graft.model.VcfVariant("chr1", 10L, "rs1", "A", Array("C"),
      None, (0 until 20).map(i => s"f${i * 9}").mkString(";"),
      Array.empty, Array.empty, Array.empty, Array.empty)
    val dir = tmpDir("bcff")
    Bcf.write(s"$dir/f.bcf", "##h", Seq(v), contigs, filters, infoKeys)
    val (_, back) = Bcf.read(s"$dir/f.bcf", contigs, filters, infoKeys)
    assert(back.head.filter === v.filter)
  }

  test("site-level BCF2 round-trip over BGZF") {
    val dir = tmpDir("bcf")
    val f = s"$dir/t.bcf"
    val contigs = Array("chr1", "chr2")
    val filters = Array("PASS", "q10")
    val infoKeys = Array("DP", "AF", "DB")
    val vs = (0 until 120).map { i =>
      graft.model.VcfVariant(
        chrom = contigs(i % 2), pos = 100L + i, id = s"rs$i", ref = "A",
        alt = if (i % 4 == 0) Array("G", "T") else Array("C"),
        qual = if (i % 7 == 0) None else Some(i.toDouble),
        filter = if (i % 5 == 0) "q10" else "PASS",
        infoKeys = Array("DP", "DB"), infoValues = Array(s"${i * 2}", ""),
        format = Array.empty, genotypes = Array.empty)
    }
    Bcf.write(f, "##fileformat=VCFv4.3", vs, contigs, filters, infoKeys)
    val (ht, back) = Bcf.read(f, contigs, filters, infoKeys)
    assert(ht === "##fileformat=VCFv4.3")
    assert(back.length === 120)
    back.zip(vs).foreach { case (b, v) =>
      assert(b.chrom === v.chrom && b.pos === v.pos && b.id === v.id)
      assert(b.alt.toSeq === v.alt.toSeq)
      assert(b.filter === v.filter)
      assert(b.infoValues.toSeq === v.infoValues.toSeq)
      assert(b.qual.map(_.toFloat) === v.qual.map(_.toFloat))
    }
  }

  test("genotype matrix round-trips with typed vectors (GT/int/float/char)") {
    val contigs = Array("chr1"); val filters = Array("PASS")
    val infoKeys = Array("DP")
    val fmtKeys = Array("GT", "DP", "GQ", "AD", "VAF", "FT")
    val vs = Seq(
      // mixed ploidy + phasing + missing alleles
      graft.model.VcfVariant("chr1", 10L, "rs1", "A", Array("C", "T"), Some(30.0), "PASS",
        Array("DP"), Array("55"),
        Array("GT", "DP", "AD", "VAF", "FT"),
        Array("0/1:35:12,23:0.657:PASS", "1|2:40:0,40:1.0:lowq", ".:.:.:.:.")),
      // haploid + missing-in-the-middle + multi-value int with varying arity
      graft.model.VcfVariant("chr1", 11L, "rs2", "G", Array("A"), None, "PASS",
        Array.empty, Array.empty,
        Array("GT", "GQ", "AD"),
        Array("1:99:3", "./.:.:4,5", "0|1:12:6,7")),
      // values forcing int16 and int32 widths
      graft.model.VcfVariant("chr1", 12L, "rs3", "T", Array("C"), None, "PASS",
        Array.empty, Array.empty,
        Array("GT", "DP"),
        Array("0/0:30000", "0/1:2000000")),
      // sites-only record in the same file
      graft.model.VcfVariant("chr1", 13L, "rs4", "T", Array("G"), None, "PASS",
        Array.empty, Array.empty, Array.empty, Array.empty))
    val dir = tmpDir("bcfg")
    val f = s"$dir/g.bcf"
    Bcf.write(f, "##h", vs, contigs, filters, infoKeys, fmtKeys)
    val (_, back) = Bcf.read(f, contigs, filters, infoKeys, fmtKeys)
    assert(back.length === vs.length)
    back.zip(vs).foreach { case (b, v) =>
      assert(b.format.toSeq === v.format.toSeq, v.id)
      assert(b.genotypes.toSeq === v.genotypes.toSeq, v.id)
    }
  }

  test("GT with allele indices past int8 (>=63) and huge DP round-trip via wider ints") {
    val contigs = Array("chr1"); val filters = Array("PASS")
    val fmtKeys = Array("GT", "DP")
    // allele 63 -> code 128 (int8 overflow), allele 64 phased -> 131
    val v = graft.model.VcfVariant("chr1", 10L, "rs1", "A",
      (1 to 70).map(i => s"ALT$i").toArray, None, "PASS",
      Array.empty, Array.empty,
      Array("GT", "DP"),
      Array("0/63:5", "63|64:2000000000", "./.:."))
    // int32 reserved band values must not decode as missing/EOV
    val v2 = graft.model.VcfVariant("chr1", 11L, "rs2", "A", Array("C"), None, "PASS",
      Array.empty, Array.empty,
      Array("XX"),
      Array(s"${Int.MinValue}", s"${Int.MinValue + 1}", "7"))
    val dir = tmpDir("bcfwide")
    val f = s"$dir/w.bcf"
    Bcf.write(f, "##h", Seq(v, v2), contigs, filters, Array.empty, fmtKeys ++ Array("XX"))
    val (_, back) = Bcf.read(f, contigs, filters, Array.empty, fmtKeys ++ Array("XX"))
    assert(back(0).genotypes.toSeq === v.genotypes.toSeq)
    assert(back(1).genotypes.toSeq === v2.genotypes.toSeq)
  }

  test("short-arity genotypes canonicalize trailing omitted fields to '.'") {
    val contigs = Array("chr1"); val filters = Array("PASS")
    val fmtKeys = Array("GT", "GQ", "AD")
    val v = graft.model.VcfVariant("chr1", 10L, "rs1", "A", Array("C"), None, "PASS",
      Array.empty, Array.empty,
      Array("GT", "GQ", "AD"),
      Array("1:99", "0/1:12:6,7")) // first sample omits AD
    val dir = tmpDir("bcfar")
    val f = s"$dir/a.bcf"
    Bcf.write(f, "##h", Seq(v), contigs, filters, Array.empty, fmtKeys)
    val (_, back) = Bcf.read(f, contigs, filters, Array.empty, fmtKeys)
    assert(back.head.genotypes.toSeq === Seq("1:99:.", "0/1:12:6,7"))
  }

  test("genotype columns are skipped cleanly when no format dictionary is given") {
    val contigs = Array("chr1"); val filters = Array("PASS")
    val fmtKeys = Array("GT", "DP")
    val v = graft.model.VcfVariant("chr1", 10L, "rs1", "A", Array("C"), None, "PASS",
      Array.empty, Array.empty, Array("GT", "DP"), Array("0/1:9", "1/1:7"))
    val dir = tmpDir("bcfs")
    val f = s"$dir/s.bcf"
    Bcf.write(f, "##h", Seq(v), contigs, filters, Array.empty, fmtKeys)
    // reader without fmtKeys: sites still decode, matrix is dropped
    val (_, back) = Bcf.read(f, contigs, filters, Array.empty)
    assert(back.head.chrom === "chr1" && back.head.pos === 10L)
    assert(back.head.genotypes.isEmpty)
  }
}

class CramSpec extends SparkSpec {
  test("ITF8 varint round-trips (incl. 5-byte negatives, htsjdk layout)") {
    val vals = Seq(0, 1, 127, 128, 16383, 16384, 2097151, 2097152, 268435455,
      Int.MaxValue, -1, Int.MinValue, 0x12345678)
    vals.foreach { v =>
      val bos = new java.io.ByteArrayOutputStream()
      Cram.writeItf8(bos, v)
      val got = Cram.readItf8(new java.io.ByteArrayInputStream(bos.toByteArray))
      assert(got === v, s"itf8 $v")
    }
  }

  test("LTF8 varlong round-trips (no ITF8 tail trick; up to 9 bytes)") {
    val vals = Seq(0L, 1L, 127L, 128L, 16383L, 16384L, (1L << 28) - 1,
      1L << 28, (1L << 28) + 7, 300000000L, (1L << 35) + 12345,
      (1L << 49) + 1, (1L << 56) - 1, 1L << 56, Long.MaxValue, -1L,
      Long.MinValue)
    vals.foreach { v =>
      val bos = new java.io.ByteArrayOutputStream()
      Cram.writeLtf8(bos, v)
      val got = Cram.readLtf8(new java.io.ByteArrayInputStream(bos.toByteArray))
      assert(got === v, s"ltf8 $v")
    }
  }

  test("ITF8/LTF8 throw EOFException on truncated continuation bytes") {
    val bos = new java.io.ByteArrayOutputStream()
    Cram.writeItf8(bos, 0x12345678)
    val full = bos.toByteArray
    intercept[java.io.EOFException] {
      Cram.readItf8(new java.io.ByteArrayInputStream(full, 0, full.length - 2))
    }
    val bos2 = new java.io.ByteArrayOutputStream()
    Cram.writeLtf8(bos2, 300000000L)
    val full2 = bos2.toByteArray
    intercept[java.io.EOFException] {
      Cram.readLtf8(new java.io.ByteArrayInputStream(full2, 0, full2.length - 1))
    }
  }

  private def synthCram(bodies: Seq[Int], counterBase: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("CRAM".getBytes(UTF_8))
    bos.write(3); bos.write(0)
    bos.write(new Array[Byte](20)) // file id
    def w32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
    }
    bodies.zipWithIndex.foreach { case (blen, i) =>
      w32(blen) // container length (body)
      Cram.writeItf8(bos, i % 2) // ref id
      Cram.writeItf8(bos, 1000 * i) // start
      Cram.writeItf8(bos, 500) // span
      Cram.writeItf8(bos, 10 + i) // n records
      // record counter / bases are LTF8 (CRAM 3.0 §8) — use values
      // past 2^28 to prove the parse doesn't fall back to ITF8.
      Cram.writeLtf8(bos, counterBase + 10L * i)
      Cram.writeLtf8(bos, counterBase * 150 + i)
      Cram.writeItf8(bos, 1) // n blocks
      Cram.writeItf8(bos, 0) // n landmarks
      w32(0) // crc
      bos.write(new Array[Byte](blen))
    }
    bos.toByteArray
  }

  test("container enumeration walks a synthetic CRAM (LTF8 counters > 2^28)") {
    val dir = tmpDir("cram")
    val f = s"$dir/t.cram"
    Files.write(Paths.get(f), synthCram(Seq(100, 200, 50), counterBase = 300000000L))
    val cs = Cram.enumerateContainers(f)
    assert(cs.length === 3)
    assert(cs.map(_.nRecords) === Seq(10, 11, 12))
    assert(cs.map(_.refSeqId) === Seq(0, 1, 0))
    assert(cs.head.offset === 26)
  }

  test("truncated CRAM container surfaces IOException, not silent stop") {
    val dir = tmpDir("cram-trunc")
    val f = s"$dir/t.cram"
    val bytes = synthCram(Seq(100, 200), counterBase = 300000000L)
    // cut inside the second container's body
    Files.write(Paths.get(f), bytes.take(bytes.length - 10))
    val e = intercept[java.io.IOException](Cram.enumerateContainers(f))
    assert(e.getMessage.contains("truncated CRAM container"))
  }
}

class CramIOSpec extends SparkSpec {
  import graft.model.{SamHeader, SamRecord, SamRef}

  private val header = SamHeader(
    "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:10000\n@SQ\tSN:chr2\tLN:8000",
    Array(SamRef("chr1", 10000), SamRef("chr2", 8000)))

  private def mkRecs(n: Int) = (0 until n).map { i =>
    SamRecord(s"r$i", (i * 13) % 4096, if (i % 3 == 2) "chr2" else "chr1",
      1 + (i * 37) % 7000, i % 60, s"${10 + i % 20}M", "*", 0, 0,
      ("ACGT" * 10).take(10 + i % 20), ("IIFF@@" * 8).take(10 + i % 20),
      Array(s"NM:i:${i % 9}"))
  }

  test("block layer round-trips raw and gzip with CRC32 verification") {
    val data = ("cram-block-payload " * 50).getBytes("UTF-8")
    Seq(CramIO.Raw, CramIO.Gzip).foreach { m =>
      val bos = new java.io.ByteArrayOutputStream()
      CramIO.writeBlock(bos, CramIO.Block(m, CramIO.External, 7, data))
      val b = CramIO.readBlock(new java.io.ByteArrayInputStream(bos.toByteArray))
      assert(b.method === m && b.contentType === CramIO.External && b.contentId === 7)
      assert(b.data.toSeq === data.toSeq)
    }
  }

  test("corrupted block bytes fail the CRC check loudly") {
    val bos = new java.io.ByteArrayOutputStream()
    CramIO.writeBlock(bos, CramIO.Block(CramIO.Gzip, CramIO.External, 1,
      ("payload" * 40).getBytes("UTF-8")))
    val bytes = bos.toByteArray
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x40).toByte
    val e = intercept[Exception](
      CramIO.readBlock(new java.io.ByteArrayInputStream(bytes)))
    assert(e.getMessage.contains("CRC") || e.isInstanceOf[java.io.IOException],
      e.toString)
  }

  test("CRAM write + distributed read round-trips records and header") {
    import spark.implicits._
    val recs = mkRecs(800)
    val dir = tmpDir("cramio")
    val file = s"$dir/t.cram"
    CramIO.write(spark.createDataset(recs).repartition(4), header, file)
    assert(GraftIO.detect(file) === GraftIO.CramFormat)
    assert(CramIO.readHeader(file).text === header.text)
    val back = CramIO.read(spark, file).collect()
    assert(back.length === 800)
    val byName = back.map(r => r.qname -> r).toMap
    recs.foreach { r =>
      val b = byName(r.qname)
      assert((b.flag, b.rname, b.pos, b.cigar, b.seq, b.qual, b.tags.toSeq) ===
        ((r.flag, r.rname, r.pos, r.cigar, r.seq, r.qual, r.tags.toSeq)), r.qname)
    }
  }

  test("malformed foreign CRAM fails decode loudly, never misread as graft payload") {
    import spark.implicits._
    // simulate an htsjdk-written file: keep a CramIO-written header
    // container, then append a structurally valid data container whose
    // compression header lacks the graft marker
    val dir = tmpDir("cramforeign")
    val file = s"$dir/f.cram"
    val ht = "@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:1000"
    val recs = Seq(graft.model.SamRecord("q0", 0, "chr1", 10, 60, "5M", "*", 0, 0,
      "ACGTA", "IIIII", Array.empty))
    val header = graft.model.SamHeader(ht, Array(graft.model.SamRef("chr1", 1000)))
    CramIO.write(spark.createDataset(recs).coalesce(1), header, file)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file))
    val cs = Cram.enumerateContainers(file)
    val dataOff = cs(1).offset.toInt // first data container
    val out = new java.io.ByteArrayOutputStream()
    out.write(bytes, 0, dataOff)
    // marker-less data container
    val body = new java.io.ByteArrayOutputStream()
    CramIO.writeBlock(body, CramIO.Block(CramIO.Raw, CramIO.CompressionHeader, 0, Array[Byte](0, 0, 0)))
    CramIO.writeBlock(body, CramIO.Block(CramIO.Raw, CramIO.External, 7, Array[Byte](1, 2, 3, 4)))
    val bb = body.toByteArray
    def w32(o: java.io.OutputStream, v: Int): Unit = {
      o.write(v & 0xff); o.write((v >> 8) & 0xff)
      o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff)
    }
    w32(out, bb.length)
    Cram.writeItf8(out, 0); Cram.writeItf8(out, 10); Cram.writeItf8(out, 5)
    Cram.writeItf8(out, 1) // nRecords > 0 → data container
    Cram.writeLtf8(out, 0L); Cram.writeLtf8(out, 0L)
    Cram.writeItf8(out, 2); Cram.writeItf8(out, 0)
    w32(out, 0) // header crc (not verified by enumeration)
    out.write(bb)
    java.nio.file.Files.write(java.nio.file.Paths.get(file), out.toByteArray)
    // the out-of-band rewrite invalidates Hadoop's local checksum sidecar
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(s"$dir/.f.cram.crc"))
    // a container without the graft marker routes to the foreign
    // data-series decoder (ForeignCramSpec proves real htslib files
    // decode); this one's compression header is garbage, so the read
    // must fail rather than misinterpret the bytes as graft payloads
    intercept[Exception](CramIO.read(spark, file).collect())
  }

  test("graft-written CRAM walks with enumerateContainers incl. spec EOF sentinel") {
    import spark.implicits._
    val dir = tmpDir("cramwalk")
    val file = s"$dir/w.cram"
    CramIO.write(spark.createDataset(mkRecs(300)).repartition(2), header, file)
    val cs = Cram.enumerateContainers(file)
    // header container + >=2 data containers + EOF container
    assert(cs.length >= 4, cs.toString)
    assert(cs.head.nRecords === 0) // SAM header container
    val eof = cs.last
    assert(eof.refSeqId === -1 && eof.startPos === 4542278 && eof.nRecords === 0)
    assert(cs.map(_.nRecords.toLong).sum === 300L)
  }
}
