package graft.sources

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{SamHeader, SamRecord, SamRef}

/** Property-based robustness: arbitrary payloads through BGZF,
  * generated records through the BAM codec, arbitrary split points
  * through the boundary guesser. */
class PropertySpec extends AnyFunSuite {

  /** Deterministic sampling loop standing in for forAll (the
    * scalatest/scalacheck bridge artifact isn't in the offline cache). */
  private def forSamples[A](gen: Gen[A], n: Int = 150)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  private val header = SamHeader(
    "@HD\tVN:1.6\n@SQ\tSN:c1\tLN:100000\n@SQ\tSN:c2\tLN:100000",
    Array(SamRef("c1", 100000), SamRef("c2", 100000)))
  private val refIdx = header.refs.map(_.name).zipWithIndex.toMap

  test("BGZF round-trips arbitrary byte payloads at arbitrary block sizes") {
    val gen = for {
      data <- Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))
      blockSize <- Gen.choose(64, 60000)
    } yield (data, blockSize)
    forSamples(gen, 100) { case (data, blockSize) =>
      val bos = new java.io.ByteArrayOutputStream()
      val out = new Bgzf.BgzfOutputStream(bos, blockSize = math.min(blockSize, 0xff00))
      out.write(data)
      out.close()
      val in = new Bgzf.BgzfInputStream(new java.io.ByteArrayInputStream(bos.toByteArray))
      val back = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1024)
      var r = in.read(buf)
      while (r > 0) { back.write(buf, 0, r); r = in.read(buf) }
      assert(back.toByteArray === data)
    }
  }

  private val genBase = Gen.oneOf('A', 'C', 'G', 'T', 'N')
  private val genQual = Gen.choose(33, 93).map(_.toChar)
  private val genRecord: Gen[SamRecord] = for {
    qlen <- Gen.choose(1, 20)
    qname <- Gen.listOfN(qlen, Gen.alphaNumChar).map(_.mkString)
    flag <- Gen.choose(0, 4095)
    rname <- Gen.oneOf("c1", "c2", "*")
    pos <- if (true) Gen.choose(1, 99000) else Gen.const(0)
    mapq <- Gen.choose(0, 254)
    seqLen <- Gen.choose(1, 60)
    seq <- Gen.listOfN(seqLen, genBase).map(_.mkString)
    qual <- Gen.listOfN(seqLen, genQual).map(_.mkString)
    nm <- Gen.choose(0, 100)
    tagStr <- Gen.listOfN(Gen.choose(0, 12).sample.getOrElse(4),
      Gen.alphaNumChar).map(_.mkString)
  } yield SamRecord(
    qname = if (qname.isEmpty) "q" else qname,
    flag = flag,
    rname = rname,
    pos = if (rname == "*") 0 else pos,
    mapq = mapq,
    cigar = if (rname == "*") "*" else s"${seqLen}M",
    rnext = "*", pnext = 0, tlen = 0,
    seq = seq, qual = qual,
    tags = Array(s"NM:i:$nm", s"XX:Z:$tagStr"))

  test("BAM codec round-trips generated records") {
    forSamples(genRecord, 300) { r =>
      val dec = BamCodec.decode(BamCodec.encode(r, refIdx), header.refs)
      assert(dec.qname === r.qname)
      assert(dec.flag === r.flag)
      assert(dec.rname === r.rname)
      assert(dec.pos === r.pos)
      assert(dec.seq === r.seq)
      assert(dec.qual === r.qual)
      assert(dec.tags.toSeq === r.tags.toSeq)
    }
  }

  test("ITF8/LTF8 round-trip arbitrary values") {
    forSamples(Gen.choose(Int.MinValue, Int.MaxValue), 300) { v =>
      val bos = new java.io.ByteArrayOutputStream()
      Cram.writeItf8(bos, v)
      assert(Cram.readItf8(new java.io.ByteArrayInputStream(bos.toByteArray)) === v)
    }
    forSamples(Gen.choose(Long.MinValue, Long.MaxValue), 300) { v =>
      val bos = new java.io.ByteArrayOutputStream()
      Cram.writeLtf8(bos, v)
      assert(Cram.readLtf8(new java.io.ByteArrayInputStream(bos.toByteArray)) === v)
    }
  }

  test("CSI binning invariants hold for arbitrary intervals and parameters") {
    val gen = for {
      minShift <- Gen.oneOf(12, 14, 16)
      depth <- Gen.choose(3, 7)
      // cover coordinates past 2^29 (where minShift+3*depth hits 32
      // and Int shifts would wrap) and past tree capacity (clamped)
      beg <- Gen.choose(0, Int.MaxValue - (1 << 21))
      len <- Gen.choose(1, 1 << 20)
    } yield (minShift, depth, beg, beg + len)
    forSamples(gen, 500) { case (ms, d, beg, end) =>
      val bin = Csi.reg2bin(beg, end, ms, d)
      val bins = Csi.reg2bins(beg, end, ms, d)
      // the assigned bin is among the overlapping bins
      assert(bins.contains(bin), s"bin $bin not in reg2bins [$beg,$end) ms=$ms d=$d")
      // the assigned bin's interval starts at or before the record
      assert(Csi.binStart(bin, ms, d) <= beg)
      // an in-capacity point query at beg must fetch the record's bin
      if (end.toLong <= (1L << (ms + 3 * d)))
        assert(Csi.reg2bins(beg, beg + 1, ms, d).contains(bin),
          s"point query at $beg misses bin $bin ms=$ms d=$d")
    }
  }

  test("CRAM block layer round-trips arbitrary payloads (raw + gzip)") {
    val gen = for {
      data <- Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))
      method <- Gen.oneOf(CramIO.Raw, CramIO.Gzip)
      id <- Gen.choose(0, 1 << 20)
    } yield (data, method, id)
    forSamples(gen, 150) { case (data, method, id) =>
      val bos = new java.io.ByteArrayOutputStream()
      CramIO.writeBlock(bos, CramIO.Block(method, CramIO.External, id, data))
      val b = CramIO.readBlock(new java.io.ByteArrayInputStream(bos.toByteArray))
      assert(b.contentId === id)
      assert(b.data.toSeq === data.toSeq)
    }
  }

  private val genAllele = Gen.frequency(
    (8, Gen.choose(0, 3).map(_.toString)),
    (1, Gen.choose(4, 120).map(_.toString)),
    (1, Gen.const(".")))
  private val genGt: Gen[String] = for {
    ploidy <- Gen.choose(1, 4)
    alleles <- Gen.listOfN(ploidy, genAllele)
    seps <- Gen.listOfN(math.max(0, ploidy - 1), Gen.oneOf("/", "|"))
  } yield alleles.head + seps.zip(alleles.tail).map { case (s, a) => s + a }.mkString

  test("BCF genotype matrix round-trips generated GT/int/float matrices") {
    val genSample = for {
      gt <- genGt
      dp <- Gen.frequency((6, Gen.choose(0, 3000000).map(_.toString)), (1, Gen.const(".")))
      vafRaw <- Gen.choose(0, 1000)
      vaf <- Gen.oneOf(java.lang.Float.toString(vafRaw / 1000.0f), ".")
    } yield s"$gt:$dp:$vaf"
    val gen = for {
      n <- Gen.choose(1, 6)
      samples <- Gen.listOfN(n, genSample)
    } yield samples.toArray
    val fmtKeys = Array("GT", "DP", "VAF")
    val fmtIdx = fmtKeys.zipWithIndex.toMap
    forSamples(gen, 200) { samples =>
      val v = graft.model.VcfVariant("c1", 5L, "x", "A", Array("C"), None, "PASS",
        Array.empty, Array.empty, fmtKeys, samples)
      val indiv = Bcf.encodeIndiv(v, fmtIdx)
      val (fmt, back) = Bcf.decodeIndiv(indiv, fmtKeys, fmtKeys.length, samples.length)
      assert(fmt.toSeq === fmtKeys.toSeq)
      assert(back.toSeq === samples.toSeq)
    }
  }

  test("tabix bounded reads equal naive overlap filtering for arbitrary " +
    "sorted VCFs, intervals, and split sizes") {
    val genVcf: Gen[Seq[graft.model.VcfVariant]] = for {
      nContigs <- Gen.choose(1, 3)
      perContig <- Gen.listOfN(nContigs, Gen.choose(0, 150))
      recs <- Gen.sequence[Seq[Seq[graft.model.VcfVariant]], Seq[graft.model.VcfVariant]](
        perContig.zipWithIndex.map { case (n, ci) =>
          Gen.listOfN(n, for {
            pos <- Gen.choose(1, 50000)
            refLen <- Gen.frequency((8, Gen.choose(1, 3)), (2, Gen.choose(50, 400)))
            endInfo <- Gen.frequency((9, Gen.const(0)), (1, Gen.choose(500, 3000)))
          } yield (pos, refLen, endInfo)).map(_.sortBy(_._1).zipWithIndex.map {
            case ((pos, refLen, endInfo), i) =>
              graft.model.VcfVariant(s"c${ci + 1}", pos.toLong, s"v${ci}_$i",
                "A" * refLen, Array("C"), None, "PASS",
                if (endInfo > 0) Array("END") else Array.empty,
                if (endInfo > 0) Array((pos + endInfo).toString) else Array.empty,
                Array.empty, Array.empty)
          })
        })
    } yield recs.flatten

    val genQuery = for {
      nIv <- Gen.choose(1, 3)
      ivs <- Gen.listOfN(nIv, for {
        c <- Gen.choose(1, 3).map(i => s"c$i")
        s <- Gen.choose(1, 50000)
        w <- Gen.choose(0, 20000)
      } yield (c, s, s + w))
      splitSize <- Gen.oneOf(256L, 4096L, 1L << 20)
    } yield (ivs, splitSize)

    forSamples(Gen.zip(genVcf, Gen.listOfN(6, genQuery)), 25) { case (vs, queries) =>
      val dir = java.nio.file.Files.createTempDirectory("tbxprop").toString
      val f = s"$dir/t.vcf.bgz"
      val (fs, p) = Fs.get(f)
      val out = new Bgzf.BgzfOutputStream(fs.create(p, true), blockSize = 512)
      out.write("##fileformat=VCFv4.3\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        .getBytes("UTF-8"))
      vs.foreach(v => out.write((Vcf.formatLine(v) + "\n").getBytes("UTF-8")))
      out.close()
      Tabix.buildAndWriteVcf(f)
      queries.foreach { case (ivs, splitSize) =>
        val merged = Vcf.mergeIntervals(ivs)
        val naive = vs.filter { v =>
          merged.get(v.chrom).exists(_.exists { case (s, e) =>
            v.pos <= e && Vcf.spanEnd(v) >= s
          })
        }.map(_.id).sorted
        val indexed = Vcf.planBounded(f, ivs, splitSize) match {
          case Some(tasks) => tasks.flatMap(Vcf.readTask).map(_.id)
          case None => fail("index written but planBounded returned None")
        }
        assert(indexed.length === indexed.distinct.length,
          s"duplicates across tasks (splitSize=$splitSize ivs=$ivs)")
        assert(indexed.sorted === naive,
          s"mismatch (splitSize=$splitSize ivs=$ivs)")
      }
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    }
  }

  test("packed k-grams decode back to the naive lowercase substrings") {
    val gen = for {
      k <- Gen.choose(1, 8)
      len <- Gen.choose(0, 200)
      text <- Gen.listOfN(len, Gen.frequency(
        (8, Gen.alphaNumChar), (2, Gen.oneOf(' ', '.', ',', '!')))).map(_.mkString)
    } yield (text, k)
    forSamples(gen, 200) { case (text, k) =>
      val packed = graft.functions.GraftFunctions.packGrams(
        org.apache.spark.unsafe.types.UTF8String.fromString(text), k)
        .toLongArray()
      val lower = text.toLowerCase
      val naive = (0 to lower.length - k).map(i => lower.substring(i, i + k))
      assert(packed.length === math.max(0, naive.length))
      packed.zip(naive).foreach { case (p, g) =>
        val decoded = new String((0 until k).map { j =>
          ((p >>> (8 * (k - 1 - j))) & 0xff).toByte
        }.toArray, java.nio.charset.StandardCharsets.UTF_8)
        assert(decoded === g)
      }
    }
  }

  test("BCF bounded reads equal naive overlap filtering under a CSI for " +
    "arbitrary sorted files and intervals") {
    val contigs = Array("c1", "c2")
    val filters = Array("PASS")
    val infoKeys = Array("DP")
    val genFile = for {
      perContig <- Gen.listOfN(2, Gen.choose(0, 120))
      recs <- Gen.sequence[Seq[Seq[graft.model.VcfVariant]], Seq[graft.model.VcfVariant]](
        perContig.zipWithIndex.map { case (n, ci) =>
          Gen.listOfN(n, for {
            pos <- Gen.choose(1, 40000)
            refLen <- Gen.frequency((8, Gen.choose(1, 3)), (2, Gen.choose(50, 500)))
          } yield (pos, refLen)).map(_.sortBy(_._1).zipWithIndex.map {
            case ((pos, refLen), i) =>
              graft.model.VcfVariant(contigs(ci), pos.toLong, s"v${ci}_$i",
                "A" * refLen, Array("C"), None, "PASS",
                Array("DP"), Array("7"), Array.empty, Array.empty)
          })
        })
    } yield recs.flatten
    val genQuery = for {
      c <- Gen.oneOf("c1", "c2", "c3")
      s <- Gen.choose(1, 40000)
      w <- Gen.choose(0, 15000)
      splitSize <- Gen.oneOf(512L, 1L << 20)
    } yield (Seq((c, s, s + w)), splitSize)

    forSamples(Gen.zip(genFile, Gen.listOfN(5, genQuery)), 20) { case (vs, queries) =>
      val dir = java.nio.file.Files.createTempDirectory("bcfprop").toString
      val f = s"$dir/t.bcf"
      Bcf.write(f, BcfIO.Dicts(contigs, filters, infoKeys).headerText,
        vs, contigs, filters, infoKeys)
      Csi.buildAndWriteBcf(f)
      val dicts = BcfIO.dictsOf(f)
      queries.foreach { case (ivs, splitSize) =>
        val merged = Vcf.mergeIntervals(ivs)
        val naive = vs.filter { v =>
          merged.get(v.chrom).exists(_.exists { case (s, e) =>
            v.pos <= e && v.pos + math.max(1, v.ref.length) - 1 >= s
          })
        }.map(_.id).sorted
        BcfIO.planIntervalRanges(f, ivs, splitSize) match {
          case Some(ranges) =>
            val got = ranges.flatMap { case (s0, e0) =>
              BcfIO.openRange(f, s0, e0, dicts)
            }.filter { v =>
              merged.get(v.chrom).exists(_.exists { case (s, e) =>
                v.pos <= e && v.pos + math.max(1, v.ref.length) - 1 >= s
              })
            }.map(_.id)
            assert(got.length === got.distinct.length,
              s"duplicates (splitSize=$splitSize ivs=$ivs)")
            assert(got.sorted === naive, s"mismatch (splitSize=$splitSize ivs=$ivs)")
          case None => fail(".csi written but planIntervalRanges returned None")
        }
      }
      val (fs, _) = Fs.get(f)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    }
  }

  test(".fai region arithmetic equals naive substring for arbitrary " +
    "line widths, contig lengths, and query ranges") {
    val gen = for {
      nContigs <- Gen.choose(1, 4)
      geoms <- Gen.listOfN(nContigs, for {
        len <- Gen.choose(1, 900)
        lb <- Gen.choose(1, 97)
      } yield (len, lb))
      queries <- Gen.listOfN(8, for {
        c <- Gen.choose(0, nContigs - 1)
        a <- Gen.choose(-5, 920)
        w <- Gen.choose(0, 300)
      } yield (c, a.toLong, (a + w).toLong))
      seed <- Gen.choose(0, Int.MaxValue)
    } yield (geoms, queries, seed)
    forSamples(gen, 60) { case (geoms, queries, seed) =>
      val rng = new scala.util.Random(seed)
      val seqs = geoms.map { case (len, _) =>
        (0 until len).map(_ => "ACGTN" (rng.nextInt(5))).mkString
      }
      val dir = java.nio.file.Files.createTempDirectory("faiprop")
      val f = s"$dir/r.fa"
      val content = seqs.zip(geoms).zipWithIndex.map { case ((sq, (_, lb)), i) =>
        s">c$i\n${sq.grouped(lb).mkString("\n")}"
      }.mkString("", "\n", "\n")
      java.nio.file.Files.write(java.nio.file.Paths.get(f),
        content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val entries = Fasta.buildAndWriteFai(f)
      assert(entries.map(_.length) === geoms.map(_._1.toLong))
      queries.foreach { case (c, a, b) =>
        val sq = seqs(c)
        val lo = math.max(1L, a).toInt
        val hi = math.min(sq.length.toLong, b).toInt
        val expect = if (hi < lo) "" else sq.substring(lo - 1, hi)
        assert(Fasta.region(f, s"c$c", a, b) === expect,
          s"c$c[$a,$b] geom=${geoms(c)}")
      }
      val _ = dir.toFile.listFiles.foreach(_.delete())
    }
  }

  test("record-boundary guesser finds a true boundary from any offset") {
    val records = (0 until 50).map(i => genRecord.sample.get)
    val bos = new java.io.ByteArrayOutputStream()
    val starts = scala.collection.mutable.ArrayBuffer[Int]()
    records.foreach { r =>
      starts += bos.size()
      val data = BamCodec.encode(r, refIdx)
      val len = data.length
      bos.write(len & 0xff); bos.write((len >> 8) & 0xff)
      bos.write((len >> 16) & 0xff); bos.write((len >> 24) & 0xff)
      bos.write(data)
    }
    val stream = bos.toByteArray
    forSamples(Gen.choose(0, stream.length - 200), 200) { off =>
      val guess = BamCodec.guessRecordStart(
        java.util.Arrays.copyOfRange(stream, off, stream.length), header.refs.length)
      if (guess >= 0) {
        assert(starts.contains(off + guess),
          s"offset $off guessed non-boundary ${off + guess}")
      }
    }
  }
}
